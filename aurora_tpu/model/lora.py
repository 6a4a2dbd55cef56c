"""Per-roll-out-step LoRA adaptation (reference: aurora/model/lora.py).

TPU-native design: the per-step LoRA bank is stored *stacked* — ``A: (S, r, in)`` and
``B: (S, r, out)`` — and the roll-out step is a **traced** scalar. Step selection is a
``jnp.take`` on the leading axis, so a single compiled program serves every roll-out step
(the reference re-dispatches in Python per step). Modes:

* ``"single"``: one LoRA for all steps (``S == 1``).
* ``"from_second"``: zero at step 0, one shared LoRA afterwards (``S == 1``).
* ``"all"``: a different LoRA per step (``S == max_steps``).

Past ``max_steps`` the adaptation is zero in every mode.
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp

from aurora_tpu.model.nn import kaiming_uniform_init

LoRAMode = Literal["single", "from_second", "all"]

__all__ = ["LoRAMode", "lora_init", "lora_apply", "lora_weight_delta"]


def lora_init(
    key,
    d_in: int,
    d_out: int,
    r: int = 8,
    alpha: int = 8,
    max_steps: int = 40,
    mode: LoRAMode = "single",
    dtype=jnp.float32,
):
    """Initialise a stacked LoRA bank: A with the linear default init, B at zero."""
    n = max_steps if mode == "all" else 1
    ks = jax.random.split(key, n)
    A = jnp.stack([kaiming_uniform_init(k, (r, d_in), fan_in=d_in, dtype=dtype) for k in ks])
    B = jnp.zeros((n, r, d_out), dtype=dtype)
    return {"A": A, "B": B}


def lora_apply(
    p,
    x: jax.Array,
    step: jax.Array,
    *,
    r: int,
    alpha: int,
    max_steps: int,
    mode: LoRAMode,
):
    """Additive LoRA correction ``x @ A^T @ B^T * (alpha/r)`` for a traced roll-out step."""
    scaling = alpha / r
    if mode in ("single", "from_second"):
        A, B = p["A"][0], p["B"][0]
    elif mode == "all":
        idx = jnp.clip(step, 0, p["A"].shape[0] - 1)
        A = jnp.take(p["A"], idx, axis=0)
        B = jnp.take(p["B"], idx, axis=0)
    else:
        raise ValueError(f"Invalid mode: {mode}")

    out = (x @ A.astype(x.dtype).T) @ B.astype(x.dtype)
    out = out * scaling

    active = step < max_steps
    if mode == "from_second":
        active = jnp.logical_and(active, step > 0)
    return out * active.astype(x.dtype)


def lora_weight_delta(
    p,
    step: jax.Array,
    *,
    r: int,
    alpha: int,
    max_steps: int,
    mode: LoRAMode,
):
    """The LoRA correction as an effective-WEIGHT delta ``(d_in, d_out)``.

    ``x @ (W + delta)`` == ``linear + lora_apply`` up to one float re-association —
    used to fold LoRA into the fused Pallas kernels (which keep weights VMEM-resident
    and cannot run a per-row rank-8 side path): the delta is a tiny
    ``(d_in, r) @ (r, d_out)`` GEMM per block, ~0.1% of the block's FLOPs. Computed
    in the parameter dtype (f32) so the fold is at least as accurate as the bf16
    side-path of the unfused route.
    """
    scaling = alpha / r
    if mode in ("single", "from_second"):
        A, B = p["A"][0], p["B"][0]
    elif mode == "all":
        idx = jnp.clip(step, 0, p["A"].shape[0] - 1)
        A = jnp.take(p["A"], idx, axis=0)
        B = jnp.take(p["B"], idx, axis=0)
    else:
        raise ValueError(f"Invalid mode: {mode}")

    delta = (A.T @ B) * scaling  # (d_in, d_out)
    active = step < max_steps
    if mode == "from_second":
        active = jnp.logical_and(active, step > 0)
    return delta * active.astype(delta.dtype)
