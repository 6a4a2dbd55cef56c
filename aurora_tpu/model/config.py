"""Static model configuration.

All knobs of the reference constructor (reference: aurora/model/aurora.py:55-95) as one
frozen, hashable dataclass — it is used as a static argument to ``jax.jit``, so two
configs compile to two programs and everything inside the graph specialises on it.
"""

from __future__ import annotations

import dataclasses
from datetime import timedelta
from typing import Optional

from aurora_tpu.model.lora import LoRAMode
from aurora_tpu.model.swin3d import BackboneConfig

__all__ = ["AuroraConfig", "SMALL_CONFIG", "LARGE_CONFIG", "HIGHRES_CONFIG"]


@dataclasses.dataclass(frozen=True)
class AuroraConfig:
    surf_vars: tuple[str, ...] = ("2t", "10u", "10v", "msl")
    static_vars: tuple[str, ...] = ("lsm", "z", "slt")
    atmos_vars: tuple[str, ...] = ("z", "u", "v", "t", "q")
    window_size: tuple[int, int, int] = (2, 6, 12)
    encoder_depths: tuple[int, ...] = (6, 10, 8)
    encoder_num_heads: tuple[int, ...] = (8, 16, 32)
    decoder_depths: tuple[int, ...] = (8, 10, 6)
    decoder_num_heads: tuple[int, ...] = (32, 16, 8)
    latent_levels: int = 4
    patch_size: int = 4
    embed_dim: int = 512
    num_heads: int = 16
    mlp_ratio: float = 4.0
    enc_depth: int = 1
    dec_depth: int = 1
    dec_mlp_ratio: float = 2.0
    perceiver_ln_eps: float = 1e-5
    max_history_size: int = 2
    timestep_hours: float = 6.0
    stabilise_level_agg: bool = False
    use_lora: bool = True
    lora_steps: int = 40
    lora_mode: LoRAMode = "single"
    autocast: bool = False
    level_condition: Optional[tuple[float, ...]] = None
    dynamic_vars: bool = False
    atmos_static_vars: bool = False
    separate_perceiver: tuple[str, ...] = ()
    modulation_heads: tuple[str, ...] = ()
    positive_surf_vars: tuple[str, ...] = ()
    positive_atmos_vars: tuple[str, ...] = ()
    clamp_at_first_step: bool = False
    simulate_indexing_bug: bool = False
    remat: bool = False
    # Which checkpoint levels ``remat=True`` applies — "full" (the reference's
    # complete boundary list: encoder/decoder + whole backbone + stage + block),
    # "no_outer" (drop the encoder/decoder/whole-backbone wraps), or "blocks"
    # (per-block only). Each relaxation removes one forward replay from the
    # backward at the cost of keeping that level's activations resident; relax
    # when the chip has HBM headroom (see BackboneConfig.remat_scope).
    remat_scope: str = "full"
    # Training-only stochastic knobs (reference: aurora/model/aurora.py:71-72).
    # ``drop_path``: stochastic-depth peak rate, ramped linearly over the backbone
    # blocks; ``drop_rate``: dropout on the backbone proj/MLP linears. Active only
    # when a PRNG key is passed to ``forward_core`` / the train step.
    drop_path: float = 0.0
    drop_rate: float = 0.0
    # "auto" = Pallas kernels on TPU, plain XLA elsewhere; "xla" forces the XLA path.
    attention_impl: str = "auto"
    mlp_impl: str = "auto"
    variant: str = "base"  # "base" | "air_pollution" | "wave" — selects in-graph hooks.
    # Process the per-token-column level (de)aggregation in chunks of this many token
    # columns to bound peak HBM (None = single shot). Math is chunk-size invariant.
    agg_chunk_size: Optional[int] = None
    # Run the decoder's level de-aggregation cross-attention in bfloat16 (production
    # throughput mode; measured mean rel err ~1e-3 on the de-agg output, the same
    # order as the backbone-autocast rounding already present on its input). The
    # reference's decoder stays f32 even under autocast (aurora.py:327-343), so this
    # is off by default and off in all parity configurations.
    deagg_bf16: bool = False
    # Run the encoder's level aggregation cross-attention in bfloat16 (production
    # throughput mode, same contract as deagg_bf16). Its output feeds the backbone,
    # which immediately rounds to bf16 under autocast anyway, so the extra error is
    # one rounding of the perceiver stack (~1e-3 rel). Rejected in round 1 on the
    # old per-column structure (no speedup); the k-major shared-query core + fused
    # MLP tail made it profitable. Off by default and in all parity configurations.
    agg_bf16: bool = False
    surf_stats: tuple[tuple[str, tuple[float, float]], ...] = ()
    density_channel_surf_vars: tuple[str, ...] = ()
    angle_surf_vars: tuple[str, ...] = ()

    def __post_init__(self):
        # A typo'd scope would otherwise silently degrade to per-block-only
        # checkpointing (every gate comparison just reads False) — which OOMs
        # the 0.25° train step with no hint the config string was the cause.
        if self.remat_scope not in ("full", "no_outer", "blocks"):
            raise ValueError(
                f"remat_scope must be 'full', 'no_outer' or 'blocks', "
                f"got {self.remat_scope!r}."
            )

    # ------------------------------------------------------------------ derived views

    @property
    def timestep(self) -> timedelta:
        return timedelta(hours=self.timestep_hours)

    @property
    def dynamic_var_names(self) -> tuple[str, ...]:
        return ("tod_cos", "tod_sin", "dow_cos", "dow_sin", "doy_cos", "doy_sin")

    @property
    def all_static_vars(self) -> tuple[str, ...]:
        """Static variables including the dynamically-generated time features."""
        if self.dynamic_vars:
            return self.static_vars + self.dynamic_var_names
        return self.static_vars

    @property
    def all_surf_vars(self) -> tuple[str, ...]:
        """Surface variables as seen by the patch embedding (surface + static)."""
        return self.surf_vars + self.all_static_vars

    @property
    def all_atmos_vars(self) -> tuple[str, ...]:
        """Atmospheric variables as seen by the patch embedding."""
        if self.atmos_static_vars:
            return self.atmos_vars + tuple(f"static_{v}" for v in self.all_static_vars)
        return self.atmos_vars

    @property
    def backbone(self) -> BackboneConfig:
        return BackboneConfig(
            embed_dim=self.embed_dim,
            encoder_depths=self.encoder_depths,
            encoder_num_heads=self.encoder_num_heads,
            decoder_depths=self.decoder_depths,
            decoder_num_heads=self.decoder_num_heads,
            window_size=self.window_size,
            mlp_ratio=self.mlp_ratio,
            use_lora=self.use_lora,
            lora_steps=self.lora_steps,
            lora_mode=self.lora_mode,
            remat=self.remat,
            remat_scope=self.remat_scope,
            drop_path=self.drop_path,
            drop_rate=self.drop_rate,
            attention_impl=self.attention_impl,
            mlp_impl=self.mlp_impl,
        )

    @property
    def decoder_embed_dim(self) -> int:
        # The backbone's final concat skip doubles the feature dim.
        return self.embed_dim * 2

    def replace(self, **kwargs) -> "AuroraConfig":
        return dataclasses.replace(self, **kwargs)


SMALL_CONFIG = AuroraConfig(
    encoder_depths=(2, 6, 2),
    encoder_num_heads=(4, 8, 16),
    decoder_depths=(2, 6, 2),
    decoder_num_heads=(16, 8, 4),
    embed_dim=256,
    num_heads=8,
    use_lora=False,
)
"""The small (debugging) configuration (reference: aurora/model/aurora.py:568-598)."""

LARGE_CONFIG = AuroraConfig(use_lora=False)
"""The 1.3 B-parameter pretrained configuration."""

HIGHRES_CONFIG = AuroraConfig(
    patch_size=10,
    encoder_depths=(6, 8, 8),
    decoder_depths=(8, 8, 6),
)
"""The 0.1° high-resolution configuration (reference: aurora/model/aurora.py:624-643)."""
