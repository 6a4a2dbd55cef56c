#!/usr/bin/env python
"""Per-kernel on-chip equivalence: Mosaic-compiled Pallas vs the XLA reference.

CI exercises every fused kernel through the Pallas INTERPRETER on CPU
(tests/test_kernels.py, tests/test_block_routing.py); the compiled Mosaic code
paths are validated on hardware only implicitly (full-model parity: the full
0.25° f32 forward matches the torch reference at 3.2e-4 max-rel through the
entire kernel stack — TORCH_ANCHOR.json). This tool closes the per-kernel gap:
each fused path runs on the REAL chip against its XLA reference at
representative geometries, and the max-rel per kernel lands in
KERNEL_ONCHIP.json. Expected: ~1e-6 for bandwidth ops (roll), ~1e-3 for
f32-input attention/MLP chains (the MXU computes f32 dots as bf16 passes at
default precision; the XLA path pays the same, but fusion orders differ).

Usage: python tools/kernel_onchip_check.py
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def rel(a, b):
    import numpy as np

    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-30))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    assert jax.default_backend() == "tpu", "this tool needs the real chip"

    from aurora_tpu.model import swin3d

    out = {"metric": "kernel_onchip_equivalence", "backend": "tpu"}

    def block_cfg(**kw):
        return swin3d.BackboneConfig(
            embed_dim=256,
            encoder_depths=(2,), encoder_num_heads=(8,),
            decoder_depths=(2,), decoder_num_heads=(8,),
            window_size=(2, 6, 12),
            **kw,
        )

    # --- Swin block: 5D fused attention (+in-kernel tail) + fused MLP vs XLA ---
    res = (4, 36, 72)  # window-aligned 0.25°-like aspect, moderate size
    D = 256
    x = jax.random.normal(jax.random.PRNGKey(0), (1, *res, D), jnp.float32)
    c = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (1, D), jnp.float32)
    step = jnp.asarray(0, jnp.int32)
    params = swin3d.swin_block_init(jax.random.PRNGKey(2), D, block_cfg(), jnp.float32)
    # Open the adaLN-zero gate so the fused tail's modulation path is live.
    params["norm1"]["modulation"]["weight"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(3), params["norm1"]["modulation"]["weight"].shape
    )
    params["norm2"]["modulation"]["weight"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(4), params["norm2"]["modulation"]["weight"].shape
    )

    for shifted in (False, True):
        shift = (1, 3, 6) if shifted else (0, 0, 0)
        got = swin3d.swin_block_apply(
            params, x, c, res, shift, 8, step,
            block_cfg(attention_impl="pallas", mlp_impl="fused"),
        )
        ref = swin3d.swin_block_apply(
            params, x, c, res, shift, 8, step,
            block_cfg(attention_impl="xla", mlp_impl="xla"),
        )
        key = f"swin_block_{'shifted_masked' if shifted else 'unshifted'}"
        out[key] = rel(got, ref)
        print(f"{key}: {out[key]:.3e}", file=sys.stderr, flush=True)

    # bf16 (the autocast production dtype) — bitwise-comparable compute paths.
    x16 = x.astype(jnp.bfloat16)
    got = swin3d.swin_block_apply(
        params, x16, c, res, (1, 3, 6), 8, step,
        block_cfg(attention_impl="pallas", mlp_impl="fused"),
    )
    ref = swin3d.swin_block_apply(
        params, x16, c, res, (1, 3, 6), 8, step,
        block_cfg(attention_impl="xla", mlp_impl="xla"),
    )
    out["swin_block_bf16_shifted"] = rel(
        jnp.asarray(got, jnp.float32), jnp.asarray(ref, jnp.float32)
    )
    print(f"swin_block_bf16_shifted: {out['swin_block_bf16_shifted']:.3e}",
          file=sys.stderr, flush=True)

    # --- One-pass roll vs jnp.roll (pure data movement: must be exact) ---
    from aurora_tpu.ops.roll import roll3d_pallas

    got = roll3d_pallas(x, (-1, -3, -6))
    ref = jnp.roll(x, shift=(-1, -3, -6), axis=(1, 2, 3))
    out["roll3d"] = rel(got, ref)
    print(f"roll3d: {out['roll3d']:.3e}", file=sys.stderr, flush=True)

    # --- Perceiver core (agg geometry: K >= Q routes to the Mosaic kernel) ---
    from aurora_tpu.model.perceiver import (
        perceiver_resampler_init,
        resampler_shared_query_apply,
    )

    K, M, D_p, Q, heads = 13, 64800 // 8, 512, 3, 16
    p_rs = perceiver_resampler_init(
        jax.random.PRNGKey(5), latent_dim=D_p, context_dim=D_p, depth=1,
        num_heads=heads, head_dim=D_p // heads, mlp_ratio=4.0, dtype=jnp.float32,
    )
    queries = jax.random.normal(jax.random.PRNGKey(6), (Q, D_p), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(7), (K, M, D_p), jnp.float32)
    for vb16 in (False, True):
        got = resampler_shared_query_apply(
            p_rs, queries, ctx, heads, k_major=True, fuse_mlp=True,
            value_bf16=vb16, fuse_core=True,
        )
        ref = resampler_shared_query_apply(
            p_rs, queries, ctx, heads, k_major=True, fuse_mlp=False,
            value_bf16=vb16, fuse_core=False,
        )
        key = f"perceiver_core_{'bf16value' if vb16 else 'f32'}"
        out[key] = rel(
            jnp.asarray(got, jnp.float32), jnp.asarray(ref, jnp.float32)
        )
        print(f"{key}: {out[key]:.3e}", file=sys.stderr, flush=True)

    worst = max(v for k, v in out.items() if isinstance(v, float))
    out["worst"] = worst
    out["roll_exact"] = out["roll3d"] == 0.0
    with open(os.path.join(REPO, "KERNEL_ONCHIP.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
