#!/usr/bin/env python
"""Characterise the sharded backbone's communication (SPMD HLO evidence).

Compiles the model forward (or backbone alone) over a virtual ``(data, lat, lon)``
mesh and reports every collective XLA emitted: op kind, count, bytes, and the top
tensor shapes. This is the measured evidence behind docs/parallel.md — the shifted
-window rolls must lower to thin ``collective-permute`` halo exchanges, NOT
all-gathers of the token grid (reference behaviour to replace: torch.roll,
aurora/model/swin3d.py:472).

Run on CPU with virtual devices; the SPMD partitioner is identical for TPU.

Usage:
  python tools/halo_analysis.py [--full] [--lat 2 --lon 4] [--H 48 --W 192]
"""

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

ITEMSIZE = {"f32": 4, "bf16": 2, "f64": 8, "s32": 4, "u32": 4, "pred": 1, "f16": 2}


def collect_collectives(hlo: str):
    """Parse collective ops out of HLO text -> {op: {"count": n, "bytes": b, "shapes": Counter}}."""
    out = {}
    pat = re.compile(
        r"= (\S+?)\[([\d,]*)\][^ ]* "
        r"(all-gather|all-reduce|collective-permute|all-to-all|reduce-scatter)\("
    )
    for m in pat.finditer(hlo):
        dtype, shape, op = m.groups()
        sz = 1
        for x in shape.split(","):
            if x:
                sz *= int(x)
        b = sz * ITEMSIZE.get(dtype, 4)
        d = out.setdefault(op, {"count": 0, "bytes": 0, "shapes": collections.Counter()})
        d["count"] += 1
        d["bytes"] += b
        d["shapes"][f"{dtype}[{shape}]"] += b
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="full forward (default: backbone only)")
    ap.add_argument("--data", type=int, default=1)
    ap.add_argument("--lat", type=int, default=2)
    ap.add_argument("--lon", type=int, default=4)
    ap.add_argument("--H", type=int, default=48)
    ap.add_argument("--W", type=int, default=192)
    ap.add_argument("--large", action="store_true", help="1.3B config (slow CPU compile)")
    args = ap.parse_args()

    n = args.data * args.lat * args.lon
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + f" --xla_force_host_platform_device_count={n}"
    import jax

    # Always analyse on the virtual CPU mesh: the SPMD partitioner is identical, and
    # the env's TPU is a single tunnelled chip (often busy with benches).
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from aurora_tpu.model import swin3d
    from aurora_tpu.model.config import LARGE_CONFIG, SMALL_CONFIG
    from aurora_tpu.parallel.mesh import make_mesh
    from aurora_tpu.parallel.sharding import TOKENS_5D_SPEC, replicate

    cfg = LARGE_CONFIG if args.large else SMALL_CONFIG
    mesh = make_mesh(data=args.data, lat=args.lat, lon=args.lon)
    P = cfg.patch_size
    patch_res = (cfg.latent_levels, args.H // P, args.W // P)
    L = patch_res[0] * patch_res[1] * patch_res[2]
    D = cfg.embed_dim
    print(f"mesh {dict(mesh.shape)}; token grid {patch_res}; D={D}")

    params = swin3d.backbone_init(jax.random.PRNGKey(0), cfg.backbone, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, L, D), jnp.bfloat16)
    lead = jnp.ones((D,), jnp.float32)
    from jax.sharding import NamedSharding

    with jax.set_mesh(mesh):
        p_sh = replicate(params, mesh)
        x_sh = jax.device_put(
            x.reshape(1, *patch_res, D), NamedSharding(mesh, TOKENS_5D_SPEC)
        ).reshape(1, L, D)

        def f(p, xx, step):
            return swin3d.backbone_apply(p, xx, lead, step, patch_res, cfg.backbone)

        compiled = jax.jit(f).lower(p_sh, x_sh, jnp.asarray(0, jnp.int32)).compile()

    hlo = compiled.as_text()
    cols = collect_collectives(hlo)
    token_bytes = L * D * 2
    print(f"token tensor (stage 0): {token_bytes/2**20:.2f} MiB")
    for op, d in sorted(cols.items()):
        print(f"{op}: {d['count']} ops, {d['bytes']/2**20:.2f} MiB")
        for s, b in d["shapes"].most_common(5):
            print(f"    {b/2**20:8.3f} MiB  {s}")
    if not cols:
        print("no collectives (single shard?)")

    cp = cols.get("collective-permute", {"bytes": 0})["bytes"]
    ag = cols.get("all-gather", {"bytes": 0})["bytes"]
    print(
        f"halo (collective-permute) = {cp/token_bytes:.2f} x stage-0 token bytes; "
        f"all-gather = {ag/token_bytes:.2f} x"
    )


if __name__ == "__main__":
    main()
