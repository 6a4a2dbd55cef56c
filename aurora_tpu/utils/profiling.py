"""Profiling and roofline utilities (greenfield vs the reference, which has none —
SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "timed", "roofline"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/aurora_tpu_trace"):
    """Capture a jax.profiler trace around a block (view with TensorBoard/XProf)."""
    with jax.profiler.trace(log_dir):
        yield
    print(f"profiler trace written to {log_dir}")


@contextlib.contextmanager
def timed(label: str, result_holder: list | None = None):
    """Wall-clock a block, blocking on all live arrays at the end."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if result_holder is not None:
        result_holder.append(dt)
    print(f"[{label}] {dt * 1e3:.1f} ms")


# Conservative per-chip specs for roofline estimates.
CHIP_SPECS = {
    "TPU v5 lite": {"bf16_tflops": 197.0, "hbm_gbps": 819.0},
    "TPU v4": {"bf16_tflops": 275.0, "hbm_gbps": 1228.0},
    "TPU v5p": {"bf16_tflops": 459.0, "hbm_gbps": 2765.0},
}


def roofline(flops: float, bytes_moved: float, device=None) -> dict:
    """Roofline estimate: the compute/bandwidth floors for an op on this chip."""
    device = device or jax.devices()[0]
    spec = CHIP_SPECS.get(device.device_kind, {"bf16_tflops": 200.0, "hbm_gbps": 800.0})
    t_compute = flops / (spec["bf16_tflops"] * 1e12)
    t_memory = bytes_moved / (spec["hbm_gbps"] * 1e9)
    return {
        "compute_s": t_compute,
        "memory_s": t_memory,
        "bound": "compute" if t_compute > t_memory else "memory",
        "floor_s": max(t_compute, t_memory),
    }
