"""Halo-exchange regression: the sharded backbone must communicate via thin
collective-permutes, not token-grid all-gathers.

Compiles a single-stage backbone over an aligned (lat=2, lon=4) virtual mesh where
every window tiles inside one shard (per-shard grid 4x6x12 vs window 2x6x12) and
asserts on the SPMD HLO (SURVEY.md §2.5 item 2; VERDICT round-1 weak #5):

* every shifted-window roll lowers to ``collective-permute`` strips whose total
  bytes stay a small multiple of the token tensor (thin halos, not full rings);
* all-gathers are confined to the program output boundary (the final flatten to
  ``(B, L, D)`` — consumed shard-local once the decoder is sharded), never the
  per-block attention path.

``tools/halo_analysis.py`` is the exploratory version of this measurement.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding

from aurora_tpu.model import swin3d
from aurora_tpu.parallel.mesh import make_mesh
from aurora_tpu.parallel.sharding import TOKENS_5D_SPEC, replicate

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from halo_analysis import collect_collectives  # noqa: E402


@pytest.fixture(scope="module", params=["xla", "mesh_kernels"])
def compiled_hlo(request):
    """Compile the sharded backbone twice: plain-XLA blocks (round-2 behaviour) and
    the shard_map'd fused kernels (round 3: kernels stay ON under a mesh, in
    interpret mode here so the HLO is produced on CPU). Both must keep the same
    collective discipline."""
    import os

    bb = swin3d.BackboneConfig(
        embed_dim=128,
        encoder_depths=(2,),
        encoder_num_heads=(4,),
        decoder_depths=(2,),
        decoder_num_heads=(4,),
    )
    patch_res = (4, 12, 48)
    L = 4 * 12 * 48
    params = swin3d.backbone_init(jax.random.PRNGKey(0), bb, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, L, 128), jnp.bfloat16)
    lead = jnp.ones((128,), jnp.float32)
    mesh = make_mesh(data=1, lat=2, lon=4)
    if request.param == "mesh_kernels":
        os.environ["AURORA_PALLAS_INTERPRET"] = "1"
    try:
        with jax.set_mesh(mesh):
            p_sh = replicate(params, mesh)
            x_sh = jax.device_put(
                x.reshape(1, *patch_res, 128), NamedSharding(mesh, TOKENS_5D_SPEC)
            ).reshape(1, L, 128)
            compiled = (
                jax.jit(
                    lambda p, xx, s: swin3d.backbone_apply(p, xx, lead, s, patch_res, bb)
                )
                .lower(p_sh, x_sh, jnp.asarray(0, jnp.int32))
                .compile()
            )
    finally:
        if request.param == "mesh_kernels":
            os.environ.pop("AURORA_PALLAS_INTERPRET", None)
    token_bytes = L * 128 * 2
    return collect_collectives(compiled.as_text()), token_bytes


def test_rolls_lower_to_collective_permute(compiled_hlo):
    cols, token_bytes = compiled_hlo
    cp = cols.get("collective-permute")
    assert cp is not None, f"no collective-permute emitted; got {sorted(cols)}"
    # 2 shifted blocks x 2 rolls, each splitting into >= 2 axis permutes.
    assert cp["count"] >= 4
    # Thin halos: the strips must total well under 2x the token tensor.
    assert cp["bytes"] <= 2 * token_bytes, (
        f"halo volume {cp['bytes']} vs token bytes {token_bytes}"
    )


def test_no_token_grid_all_gather_in_blocks(compiled_hlo):
    cols, token_bytes = compiled_hlo
    ag = cols.get("all-gather", {"count": 0, "bytes": 0, "shapes": {}})
    # Only the program-output flatten may gather (<= 3 ops). Attention/window
    # layout gathering would show up as dozens of window-shaped all-gathers
    # (the round-1 lowering emitted 30+; see git history of halo_analysis).
    assert ag["count"] <= 3, f"all-gathers in block path: {dict(ag['shapes'])}"


def test_no_all_to_all_or_reduce_scatter(compiled_hlo):
    cols, _ = compiled_hlo
    assert "all-to-all" not in cols
    assert "reduce-scatter" not in cols


def test_full_forward_no_fp_all_gathers(monkeypatch):
    """VERDICT r2 weak #4 'done' criterion: the FULL forward_core (encoder →
    backbone → decoder) on an 8-way mesh emits no floating-point all-gathers when
    every stage is window-aligned — the shard-local encoder/decoder (model/spmd.py)
    and the shard_map'd backbone kernels keep all tensor comms to thin
    collective-permute halos. (Tiny s32/pred index gathers from roll bookkeeping
    are allowed; ZeRO params would add weight-gathers by design, so params are
    replicated here.)"""
    import numpy as np

    from aurora_tpu.model.aurora import forward_core, init_params
    from aurora_tpu.model.config import AuroraConfig
    from aurora_tpu.parallel.sharding import shard_batch_arrays
    from tests.conftest import make_batch

    monkeypatch.setenv("AURORA_PALLAS_INTERPRET", "1")
    cfg = AuroraConfig(
        embed_dim=64,
        num_heads=4,
        encoder_depths=(2, 2),
        encoder_num_heads=(2, 4),
        decoder_depths=(2, 2),
        decoder_num_heads=(4, 2),
        window_size=(2, 4, 4),
        latent_levels=2,
        patch_size=4,
        use_lora=False,
    )
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    batch = make_batch(H=65, W=128, B=2, dtype=np.float32).crop(cfg.patch_size)
    from aurora_tpu.model.aurora import Aurora

    enc = Aurora(cfg).prepare_encodings(batch)
    surf = {k: jnp.asarray(np.asarray(v)) for k, v in batch.surf_vars.items()}
    static = {k: jnp.asarray(np.asarray(v)) for k, v in batch.static_vars.items()}
    atmos = {k: jnp.asarray(np.asarray(v)) for k, v in batch.atmos_vars.items()}
    levels = tuple(batch.metadata.atmos_levels)

    mesh = make_mesh(data=2, lat=2, lon=2)
    with jax.set_mesh(mesh):
        p_sh = replicate(params, mesh)
        s_sh, st_sh, a_sh = shard_batch_arrays(surf, static, atmos, mesh)
        compiled = (
            jax.jit(forward_core, static_argnames=("atmos_levels", "cfg"))
            .lower(p_sh, s_sh, st_sh, a_sh, enc, jnp.asarray(0, jnp.int32),
                   atmos_levels=levels, cfg=cfg)
            .compile()
        )
    cols = collect_collectives(compiled.as_text())
    ag = cols.get("all-gather", {"count": 0, "bytes": 0, "shapes": {}})
    fp_gathers = {
        s: b for s, b in ag.get("shapes", {}).items()
        if s.startswith(("f32", "bf16", "f16", "f64"))
    }
    assert not fp_gathers, f"floating-point all-gathers in forward: {fp_gathers}"
    assert "all-to-all" not in cols
    # Halo traffic present and thin.
    cp = cols.get("collective-permute")
    assert cp is not None and cp["count"] >= 4
