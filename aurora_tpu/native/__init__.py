"""Native (C++) data-plane kernels, built lazily with the system toolchain.

The compute path of the framework is XLA/Pallas on the TPU; these kernels cover the
*host* data plane where the reference leans on scipy (bilinear regridding is the hot
one: a full 0.25-deg batch is ~70 fields x 1M points per roll-out step of ERA5-style
pipelines). Built on first use with ``g++ -O3 -fopenmp``; every entry point has a pure
scipy/NumPy fallback, so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "regrid.cpp"
_LIB_CACHE: list = []  # [None] = build failed; [lib] = built


def _build() -> "ctypes.CDLL | None":
    cache_dir = Path(
        os.environ.get("AURORA_TPU_NATIVE_CACHE", Path.home() / ".cache" / "aurora_tpu")
    )
    try:
        cache_dir.mkdir(parents=True, exist_ok=True)
        lib_path = cache_dir / "libaurora_native.so"
        if not lib_path.exists() or lib_path.stat().st_mtime < _SRC.stat().st_mtime:
            # Build into a sibling temp file so the final rename stays on one
            # filesystem (os.replace across filesystems raises EXDEV — /tmp is
            # commonly tmpfs). No -march=native: the cache dir may be shared across
            # heterogeneous hosts (NFS homes), and the kernel is bandwidth-bound.
            with tempfile.NamedTemporaryFile(
                dir=cache_dir, suffix=".so", delete=False
            ) as tf:
                tmp = Path(tf.name)
            cmd = [
                "g++", "-O3", "-fopenmp", "-shared", "-fPIC",
                str(_SRC), "-o", str(tmp),
            ]
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
                os.replace(tmp, lib_path)
            finally:
                tmp.unlink(missing_ok=True)
        lib = ctypes.CDLL(str(lib_path))
        lib.regrid_bilinear.restype = None
        return lib
    except Exception as e:  # toolchain missing / cache unwritable / bad .so: fall back
        logger.info("native build failed (%s); using scipy fallback", e)
        return None


def _get_lib():
    if not _LIB_CACHE:
        _LIB_CACHE.append(_build())
    return _LIB_CACHE[0]


def regrid_bilinear(
    v: np.ndarray,
    lat: np.ndarray,
    lon: np.ndarray,
    lat_new: np.ndarray,
    lon_new: np.ndarray,
) -> "np.ndarray | None":
    """Native bilinear regrid of ``(..., H, W)`` fields; None if no native library."""
    lib = _get_lib()
    if lib is None:
        return None
    batch_shape = v.shape[:-2]
    H, W = v.shape[-2:]
    v2 = np.ascontiguousarray(v.reshape(-1, H, W), dtype=np.float64)
    lat = np.ascontiguousarray(lat, dtype=np.float64)
    lon = np.ascontiguousarray(lon, dtype=np.float64)
    lat_new = np.ascontiguousarray(lat_new, dtype=np.float64)
    lon_new = np.ascontiguousarray(lon_new, dtype=np.float64)
    out = np.empty((v2.shape[0], lat_new.shape[0], lon_new.shape[0]), dtype=np.float64)

    c = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    i64 = ctypes.c_int64
    lib.regrid_bilinear(
        c(v2), i64(v2.shape[0]), i64(H), i64(W),
        c(lat), c(lon), c(lat_new), i64(lat_new.shape[0]),
        c(lon_new), i64(lon_new.shape[0]), c(out),
    )
    return out.reshape(*batch_shape, lat_new.shape[0], lon_new.shape[0])
