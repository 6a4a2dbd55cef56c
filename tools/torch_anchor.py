#!/usr/bin/env python
"""Full-scale torch anchor for the production stack (VERDICT r4 weak #3).

The f32-vs-torch parity number shipped next to the headline
(`ROLLOUT_PARITY.json`, 1.67e-6) is the SMALL model on CPU; the production
stack had no torch anchor at any scale. This tool runs the REAL thing once:
the 1.3 B reference model (random weights, FiLM gates + LoRA-B perturbed so
the backbone is not an adaLN-zero identity — the round-4 blind spot) forward
on the bench batch on host CPU, the converted weights through OUR stack on the
TPU in two modes, and records per-group errors:

  f32_highest  — autocast off, jax.default_matmul_precision('highest'):
                 the numerical-contract anchor (TPU default-precision f32 dots
                 carry ~2.3e-3/dot bf16-pass noise; HIGHEST removes it).
  production   — the shipped serving stack (autocast bf16 backbone, agg/deagg
                 bf16 value paths, bf16-stored backbone weights, LoRA fold).

Writes TORCH_ANCHOR.json. Expected: f32_highest ~1e-5..1e-4 (one step, full
scale, f32 accumulation-order differences); production ~7e-3 (its measured
one-step rounding injection, PRODUCTION_DRIFT.json).

Usage: python tools/torch_anchor.py  (~15 min: one torch CPU step is ~600 s)
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import numpy as np

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

    import torch

    from bench import LEVELS, make_numpy_batch
    from tests.conftest import load_reference

    ref = load_reference()

    # f64 position/scale encodings on the torch side: the reference's f32
    # scale-encoding arithmetic is chaotic (its own CPU and CUDA disagree), so
    # parity comparisons pin it to f64 exactly like tests/test_parity_torch.py.
    import aurora.model.posencoding as ref_pos

    orig_grid = ref_pos.pos_scale_enc_grid

    def f64_grid(encode_dim, grid, patch_dims, pos_expansion, scale_expansion):
        return orig_grid(
            encode_dim, grid.double(), patch_dims, pos_expansion, scale_expansion
        )

    ref_pos.pos_scale_enc_grid = f64_grid
    import aurora.model.encoder as ref_enc

    if hasattr(ref_enc, "pos_scale_enc_grid"):
        ref_enc.pos_scale_enc_grid = f64_grid

    print("building torch 1.3B reference ...", file=sys.stderr, flush=True)
    torch.manual_seed(0)
    ref_model = ref.Aurora(use_lora=True)
    ref_model.eval()

    # Open the adaLN-zero FiLM gates and the LoRA-B banks (zero at init — a
    # fresh model's backbone is an identity and the LoRA fold is trivially
    # exact, hiding everything downstream; reference aurora.py FiLM zero-init).
    g = torch.Generator().manual_seed(1234)
    with torch.no_grad():
        for name, p in ref_model.named_parameters():
            if "ln_modulation.1.weight" in name:
                p.copy_(0.05 * torch.randn(p.shape, generator=g))
            elif "lora_B" in name:
                p.copy_(0.02 * torch.randn(p.shape, generator=g))

    data = make_numpy_batch()
    t_batch = ref.Batch(
        surf_vars={k: torch.from_numpy(v) for k, v in data["surf"].items()},
        static_vars={k: torch.from_numpy(v) for k, v in data["static"].items()},
        atmos_vars={k: torch.from_numpy(v) for k, v in data["atmos"].items()},
        metadata=ref.Metadata(
            lat=torch.from_numpy(data["lat"]).float(),
            lon=torch.from_numpy(data["lon"]).float(),
            time=data["time"],
            atmos_levels=LEVELS,
        ),
    )
    print("torch forward (CPU, ~10 min) ...", file=sys.stderr, flush=True)
    t0 = time.time()
    with torch.inference_mode():
        t_pred = ref_model.forward(t_batch)
    print(f"torch forward: {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    ref_out = {f"surf:{k}": v.float().numpy() for k, v in t_pred.surf_vars.items()}
    ref_out.update(
        {f"atmos:{k}": v.float().numpy() for k, v in t_pred.atmos_vars.items()}
    )
    del t_pred

    print("converting weights ...", file=sys.stderr, flush=True)
    from aurora_tpu.batch import Batch, Metadata
    from aurora_tpu.checkpoint import convert_torch_state_dict
    from aurora_tpu.model.aurora import (
        Aurora,
        cast_backbone_params,
        stack_block_params,
    )
    from aurora_tpu.model.config import LARGE_CONFIG

    sd = {k: v.detach().cpu().numpy() for k, v in ref_model.state_dict().items()}
    del ref_model

    j_batch = Batch(
        surf_vars=data["surf"],
        static_vars=data["static"],
        atmos_vars=data["atmos"],
        metadata=Metadata(
            lat=data["lat"], lon=data["lon"], time=data["time"], atmos_levels=LEVELS
        ),
    )

    def run_mode(mode: str):
        if mode == "f32_highest":
            cfg = LARGE_CONFIG.replace(
                autocast=False, agg_chunk_size=8192, use_lora=True
            )
            params = convert_torch_state_dict(sd, cfg, dtype=jnp.float32)
            model = Aurora(cfg)
            with jax.default_matmul_precision("highest"):
                pred = model.forward(params, j_batch)
                out = {
                    f"surf:{k}": np.asarray(v) for k, v in pred.surf_vars.items()
                }
                out.update(
                    {f"atmos:{k}": np.asarray(v) for k, v in pred.atmos_vars.items()}
                )
        else:
            cfg = LARGE_CONFIG.replace(
                autocast=True, agg_chunk_size=8192, deagg_bf16=True, agg_bf16=True,
                use_lora=True,
            )
            params = convert_torch_state_dict(sd, cfg, dtype=jnp.float32)
            params = stack_block_params(cast_backbone_params(params))
            model = Aurora(cfg)
            pred = model.forward(params, j_batch)
            out = {f"surf:{k}": np.asarray(v) for k, v in pred.surf_vars.items()}
            out.update(
                {f"atmos:{k}": np.asarray(v) for k, v in pred.atmos_vars.items()}
            )
        del params
        return out

    H_pred = next(iter(ref_out.values())).shape[-2]
    lat = np.linspace(90, -90, 721)[:H_pred]
    w_lat = (np.cos(np.deg2rad(lat)) / np.cos(np.deg2rad(lat)).mean())[:, None]

    result = {
        "config": "LARGE 1.3B, random weights, FiLM gates + LoRA-B perturbed",
        "grid": [721, 1440],
        "date": "2026-08-20",
    }
    for mode in ("f32_highest", "production"):
        print(f"jax forward [{mode}] ...", file=sys.stderr, flush=True)
        t0 = time.time()
        out = run_mode(mode)
        dtime = time.time() - t0
        max_rel, wrmse = {}, {}
        for k in ref_out:
            d = out[k].astype(np.float64) - ref_out[k].astype(np.float64)
            scale = np.abs(ref_out[k]).max() + 1e-30
            max_rel[k] = float(np.abs(d).max() / scale)
            num = float(np.sqrt(np.mean(w_lat * d**2)))
            den = float(np.sqrt(np.mean(w_lat * ref_out[k].astype(np.float64) ** 2)))
            wrmse[k] = num / (den + 1e-30)
        result[mode] = {
            "wall_s": round(dtime, 1),
            "max_rel_err": max(max_rel.values()),
            "wrmse_rel_max": max(wrmse.values()),
            "wrmse_rel_median": float(np.median(list(wrmse.values()))),
            "worst_var": max(max_rel, key=max_rel.get),
        }
        print(
            f"[{mode}] max_rel {result[mode]['max_rel_err']:.3e} "
            f"wrmse_max {result[mode]['wrmse_rel_max']:.3e} "
            f"(worst {result[mode]['worst_var']})",
            file=sys.stderr, flush=True,
        )
        del out

    with open(os.path.join(REPO, "TORCH_ANCHOR.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
