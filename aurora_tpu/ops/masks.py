"""Shifted-window attention masks with longitude wrap-around.

Host-side NumPy, cached per static shape — masks depend only on
``(C, H, W, window, shift, warped)`` which are static under ``jit``, so they are computed
once and fed to the graph as constants (the reference achieves the same with an
``lru_cache`` on device tensors: aurora/model/swin3d.py:303-360).

Design difference from the reference: rather than materialising the full additive
``(nW, N, N)`` bias, we return the per-token *communication-group id* ``(nW, N)``. The
attention kernel turns group ids into a mask via an equality compare, which XLA fuses
into the attention computation — O(nW·N) memory instead of O(nW·N²).
"""

from __future__ import annotations

import itertools
from functools import lru_cache

import numpy as np

__all__ = ["window_group_ids", "window_bias_from_groups", "get_3d_merge_groups", "two_sided_padding", "three_sided_padding"]


def two_sided_padding(h_padding: int, w_padding: int) -> tuple[int, int, int, int]:
    """Centred padding: (left, right, top, bottom). Odd remainders go right/bottom."""
    assert h_padding >= 0 and w_padding >= 0
    top = h_padding // 2
    bottom = h_padding - top
    left = w_padding // 2
    right = w_padding - left
    return left, right, top, bottom


def three_sided_padding(c_padding: int, h_padding: int, w_padding: int):
    """Centred padding: (left, right, top, bottom, front, back)."""
    assert c_padding >= 0
    front = c_padding // 2
    back = c_padding - front
    return (*two_sided_padding(h_padding, w_padding), front, back)


def get_3d_merge_groups() -> list[tuple[int, int]]:
    """Group pairs to merge for global longitude (left-right) connectivity.

    The 3×3×3 slice decomposition yields 27 groups; in each of the 3 level-slices the
    three (middle-row, right-column) pairs merge so attention wraps around the globe
    (reference: aurora/model/swin3d.py:288-300).
    """
    merge_2d = [(1, 2), (4, 5), (7, 8)]
    return [(g1 + 9 * c, g2 + 9 * c) for c in range(3) for g1, g2 in merge_2d]


@lru_cache(maxsize=128)
def window_group_ids(
    C: int,
    H: int,
    W: int,
    ws: tuple[int, int, int],
    ss: tuple[int, int, int],
    warped: bool = True,
    extra: tuple[int, int, int] = (0, 0, 0),
) -> np.ndarray:
    """Communication-group id of every token in every window, shape ``(nW, N)`` int32.

    Tokens attend to each other iff their group ids are equal. The token grid of shape
    ``(C, H, W)`` is assumed to be cyclically shifted by ``-ss`` and then centre-padded
    to multiples of ``ws``; padded tokens get a fresh group id so they are masked out.

    ``extra`` appends that many additional padded planes/rows/columns AFTER the centre
    pad (each entry a multiple of the corresponding window size — i.e. whole extra
    windows). Whole pad-only windows never change which window any real token falls
    into, so attention output at real positions is bit-identical to ``extra=(0,0,0)``;
    this is how the mesh path over-pads shard-misaligned grids (e.g. the 0.25° serving
    shape over 8 chips) while preserving exact single-device numerics.
    """
    img = np.zeros((C, H, W), dtype=np.int32)
    c_slices = (slice(0, -ws[0]), slice(-ws[0], -ss[0]), slice(-ss[0], None))
    h_slices = (slice(0, -ws[1]), slice(-ws[1], -ss[1]), slice(-ss[1], None))
    w_slices = (slice(0, -ws[2]), slice(-ws[2], -ss[2]), slice(-ss[2], None))

    cnt = 0
    for c, h, w in itertools.product(c_slices, h_slices, w_slices):
        img[c, h, w] = cnt
        cnt += 1

    if warped:
        for grp1, grp2 in get_3d_merge_groups():
            img[img == grp1] = grp2

    # Centre-pad to window multiples; padded entries form their own group (id = cnt).
    pad = ((-C) % ws[0], (-H) % ws[1], (-W) % ws[2])
    left, right, top, bottom, front, back = three_sided_padding(*pad)
    img = np.pad(
        img,
        ((front, back), (top, bottom), (left, right)),
        constant_values=cnt,
    )
    if any(extra):
        assert all(e % w == 0 for e, w in zip(extra, ws)), (extra, ws)
        img = np.pad(
            img,
            ((0, extra[0]), (0, extra[1]), (0, extra[2])),
            constant_values=cnt,
        )

    Cp, Hp, Wp = img.shape
    img = img.reshape(Cp // ws[0], ws[0], Hp // ws[1], ws[1], Wp // ws[2], ws[2])
    img = img.transpose(0, 2, 4, 1, 3, 5)  # (C1, H1, W1, wc, wh, ww)
    return np.ascontiguousarray(img.reshape(-1, ws[0] * ws[1] * ws[2]))


def window_bias_in_graph(groups: np.ndarray):
    """Additive attention bias built IN-GRAPH from the (nW, N) group ids.

    Same values as :func:`window_bias_from_groups` (0 where ids match, -100
    otherwise), but the embedded program constant is the 1 MiB s32 id table
    instead of the 142 MiB f32 bias (0.25° stage 0): serialized modules shrink
    by ~330 MiB and the bias becomes a cheap elementwise temp XLA can CSE
    across blocks. Kernels consume the result exactly like the constant.

    ``AURORA_MASK_CONSTANTS=1`` (trace-time env hook, like ``AURORA_FORCE_OVERPAD``)
    reverts to embedding the f32 constant — the round-3 form — for same-session
    A/B of the two representations (tools/headline_bisect.py).
    """
    import os

    import jax.numpy as jnp

    if os.environ.get("AURORA_MASK_CONSTANTS", "0") == "1":
        return jnp.asarray(window_bias_from_groups(np.asarray(groups)))
    g = jnp.asarray(np.ascontiguousarray(groups))
    return jnp.where(g[:, :, None] == g[:, None, :], 0.0, -100.0).astype(jnp.float32)


def window_bias_from_groups(groups: np.ndarray, dtype=np.float32):
    """Additive attention bias ``(nW, N, N)`` from group ids (cached).

    0 where the group ids match, -100 otherwise — the reference's mask values
    (aurora/model/swin3d.py:357-358). Returns the same (cached) NumPy object per
    geometry so every block shares one graph constant. Both values are exactly
    representable in bfloat16, so the kernels request ``dtype="bfloat16"`` to
    halve the embedded-constant HBM (the stage-0 0.25° mask is 142 MiB in f32,
    253 MiB after TPU tile padding) and upcast to f32 at the logits add —
    bit-identical numerics.
    """
    return _window_bias_cached(groups.tobytes(), groups.shape, np.dtype(dtype).name)


@lru_cache(maxsize=32)
def _window_bias_cached(g_bytes: bytes, shape, dtype_name: str):
    # Return the SAME NumPy object for a given geometry: jax's constant lowering is
    # keyed on object id, so every block embedding this bias shares one ~150 MB graph
    # constant. (Caching a jax array here is wrong twice over: created inside a jit
    # trace it would be a leaked tracer, and created eagerly it can deadlock
    # remote-compile runtimes.)
    if dtype_name == "bfloat16":
        import ml_dtypes

        dtype = np.dtype(ml_dtypes.bfloat16)
    else:
        dtype = np.dtype(dtype_name)
    g = np.frombuffer(g_bytes, dtype=np.int32).reshape(shape)
    return np.where(g[:, :, None] == g[:, None, :], 0.0, -100.0).astype(dtype)
