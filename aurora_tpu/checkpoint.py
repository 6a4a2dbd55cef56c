"""Torch checkpoint → JAX parameter-pytree converter.

Converts the reference's released state dicts (PyTorch naming/layout, see
aurora/model/aurora.py:409-456) into this framework's parameter trees:

* Linear ``weight``: torch ``(out, in)`` → JAX ``(in, out)``.
* Patch-embed variable kernels: torch ``(D, 1, T, P, P)`` → ``(T, P, P, D)``
  (conv-as-matmul layout, see aurora_tpu/model/patchembed.py).
* LoRA banks: per-step modules → stacked ``A: (S, r, in)``, ``B: (S, r, out)``.
* Perceiver ``ModuleList`` indices → named fields (``attn``/``mlp``/``ln1``/``ln2``).
* Schema migrations of old released checkpoints (ID-based → name-based parameters,
  air-pollution and wave renames) mirror reference aurora/model/compat.py.

Also includes Orbax-based save/restore of native parameter trees.
"""

from __future__ import annotations

import re
from typing import Mapping

import jax.numpy as jnp
import numpy as np

from aurora_tpu.model.config import AuroraConfig
from aurora_tpu.normalisation import level_to_str

__all__ = [
    "convert_torch_state_dict",
    "adapt_checkpoint_pretrained",
    "adapt_checkpoint_air_pollution",
    "adapt_checkpoint_wave",
    "adapt_max_history_size",
    "load_torch_checkpoint",
    "save_params",
    "restore_params",
    "save_train_state",
    "restore_train_state",
]

_RESAMPLER_RE = re.compile(
    r"(level_agg|level_decoder_alternate|level_decoder)\.layers\.(\d+)\.([0-3])\."
)
_RESAMPLER_SLOT = {"0": "attn", "1": "mlp", "2": "ln1", "3": "ln2"}

# Path components after which a numeric component is a *list index*.
_LIST_PARENTS = {"encoder_layers", "decoder_layers", "blocks", "_rs_layers"}


def _rename(key: str) -> str:
    """Torch parameter name → native parameter path (dot-separated)."""
    k = key
    # Perceiver resampler slots; tag its `layers` so they parse as list indices.
    k = _RESAMPLER_RE.sub(lambda m: f"{m.group(1)}._rs_layers.{m.group(2)}.{_RESAMPLER_SLOT[m.group(3)]}.", k)
    # Perceiver-style MLPs: Sequential indices → fc1/fc2.
    k = k.replace(".net.0.", ".fc1.").replace(".net.2.", ".fc2.")
    # Backbone lead-time MLP.
    k = k.replace("time_mlp.0.", "time_mlp.fc1.").replace("time_mlp.2.", "time_mlp.fc2.")
    # FiLM modulation.
    k = k.replace("ln_modulation.1.", "modulation.")
    return k


def _set_path(tree: dict, parts: list[str], value) -> None:
    node = tree
    for i, part in enumerate(parts[:-1]):
        is_list_index = part.isdigit() and i > 0 and parts[i - 1] in _LIST_PARENTS
        if is_list_index:
            idx = int(part)
            assert isinstance(node, list)
            while len(node) <= idx:
                node.append({})
            node = node[idx]
        else:
            nxt_is_list = parts[i + 1].isdigit() and part in _LIST_PARENTS
            if part not in node:
                node[part] = [] if nxt_is_list else {}
            node = node[part]
    node[parts[-1]] = value


def _strip_rs_tag(tree):
    """Rename the temporary ``_rs_layers`` tag back to ``layers``."""
    if isinstance(tree, dict):
        return { ("layers" if k == "_rs_layers" else k): _strip_rs_tag(v) for k, v in tree.items() }
    if isinstance(tree, list):
        return [_strip_rs_tag(v) for v in tree]
    return tree


def convert_torch_state_dict(
    sd: Mapping[str, np.ndarray],
    cfg: AuroraConfig,
    dtype=jnp.float32,
    leaf_fn=None,
) -> dict:
    """Convert a (already schema-migrated) torch state dict into a parameter pytree.

    ``leaf_fn(value, dtype)`` constructs each leaf (default: ``jnp.asarray``); pass
    e.g. ``lambda v, d: jax.ShapeDtypeStruct(v.shape, d)`` for an allocation-free
    structural dry-run (tests/test_ckpt_manifest.py).
    """
    if leaf_fn is None:
        leaf_fn = lambda v, d: jnp.asarray(v, d)  # noqa: E731
    tree: dict = {}
    lora_acc: dict[str, dict[int, np.ndarray]] = {}

    for key, value in sd.items():
        v = np.asarray(value)
        k = _rename(key)

        m = re.search(r"(lora_qkv|lora_proj)\.loras\.(\d+)\.(lora_A|lora_B)$", k)
        if m:
            base = k[: m.start()] + m.group(1) + "." + ("A" if m.group(3) == "lora_A" else "B")
            step = int(m.group(2))
            if m.group(3) == "lora_B":
                v = v.T  # torch (out, r) → (r, out)
            lora_acc.setdefault(base, {})[step] = v
            continue

        parts = k.split(".")
        if v.ndim == 5:
            # Patch-embed kernel (D, 1, T, P, P) → (T, P, P, D).
            v = np.transpose(v[:, 0], (1, 2, 3, 0))
        elif v.ndim == 2 and parts[-1] == "weight":
            v = v.T  # Linear (out, in) → (in, out).
        _set_path(tree, parts, leaf_fn(v, dtype))

    for base, steps in lora_acc.items():
        stacked = np.stack([steps[i] for i in range(len(steps))], axis=0)
        _set_path(tree, base.split("."), leaf_fn(stacked, dtype))

    return _strip_rs_tag(tree)


# ------------------------------------------------------------------ schema migration


def adapt_checkpoint_pretrained(patch_size: int, d: dict) -> dict:
    """ID-based → name-based parameter migration for the original released
    checkpoints (mirrors reference aurora/model/compat.py:18-75)."""
    d = dict(d)
    for k in list(d):
        if k.startswith("net."):
            d[k[4:]] = d.pop(k)

    if "encoder.surf_token_embeds.weight" in d:
        weight = d.pop("encoder.surf_token_embeds.weight")
        assert weight.shape[1] == 4 + 3
        for i, name in enumerate(("2t", "10u", "10v", "msl", "lsm", "z", "slt")):
            d[f"encoder.surf_token_embeds.weights.{name}"] = weight[:, [i]]

    if "encoder.atmos_token_embeds.weight" in d:
        weight = d.pop("encoder.atmos_token_embeds.weight")
        assert weight.shape[1] == 5
        for i, name in enumerate(("z", "u", "v", "t", "q")):
            d[f"encoder.atmos_token_embeds.weights.{name}"] = weight[:, [i]]

    for head, names in (
        ("surf_head", ("2t", "10u", "10v", "msl")),
        ("atmos_head", ("z", "u", "v", "t", "q")),
    ):
        if f"decoder.{head}.weight" in d:
            weight = d.pop(f"decoder.{head}.weight")
            bias = d.pop(f"decoder.{head}.bias")
            n = len(names)
            assert weight.shape[0] == n * patch_size**2
            weight = weight.reshape(patch_size**2, n, -1)
            bias = bias.reshape(patch_size**2, n)
            plural = head.replace("head", "heads")
            for i, name in enumerate(names):
                d[f"decoder.{plural}.{name}.weight"] = weight[:, i]
                d[f"decoder.{plural}.{name}.bias"] = bias[:, i]
    return d


_POLLUTION_LEVELS = (50, 100, 150, 200, 250, 300, 400, 500, 600, 700, 850, 925, 1000)


def adapt_checkpoint_air_pollution(patch_size: int, d: dict) -> dict:
    """Air-pollution checkpoint migration, including the deliberate ``z``/``static_z``
    aliasing and patch-embed bias merging (mirrors reference compat.py:78-270)."""
    d = dict(d)

    if "encoder.surf_token_embeds.weight_new" in d:
        weight = d.pop("encoder.surf_token_embeds.weight_new")
        assert weight.shape[1] == (3 + 5) + 4 * 2 + 3 * 2
        names = (
            ("pm1", "pm2p5", "pm10", "tcco", "tc_no", "tcno2", "gtco3", "tcso2")
            + ("static_ammonia", "static_ammonia_log", "static_co", "static_co_log")
            + ("static_nox", "static_nox_log", "static_so2", "static_so2_log")
            + ("tod_cos", "tod_sin", "dow_cos", "dow_sin", "doy_cos", "doy_sin")
        )
        for i, name in enumerate(names):
            d[f"encoder.surf_token_embeds.weights.{name}"] = weight[:, [i]]

    if (
        "encoder.atmos_token_embeds.weights.z" in d
        and "encoder.atmos_token_embeds_new.layers.50.weight" in d
    ):
        bias = d.pop("encoder.atmos_token_embeds.bias")
        for name in ("z", "u", "v", "t", "q"):
            weight = d.pop(f"encoder.atmos_token_embeds.weights.{name}")
            for level in _POLLUTION_LEVELS:
                d[f"encoder.atmos_token_embeds.layers.{level}.weights.{name}"] = np.array(
                    weight, copy=True
                )
                d[f"encoder.atmos_token_embeds.layers.{level}.bias"] = np.array(
                    bias, copy=True
                )

    if "encoder.atmos_token_embeds.weight_new2" in d:
        weight = d.pop("encoder.atmos_token_embeds.weight_new2")
        assert weight.shape[1] == 17
        names = (
            ("static_lsm", "static_z", "static_slt")
            + ("static_static_ammonia", "static_static_ammonia_log")
            + ("static_static_co", "static_static_co_log")
            + ("static_static_nox", "static_static_nox_log")
            + ("static_static_so2", "static_static_so2_log")
            + ("static_tod_cos", "static_tod_sin", "static_dow_cos")
            + ("static_dow_sin", "static_doy_cos", "static_doy_sin")
        )
        for level in _POLLUTION_LEVELS:
            for i, name in enumerate(names):
                d[f"encoder.atmos_token_embeds.layers.{level_to_str(level)}.weights.{name}"] = (
                    weight[:, [i]]
                )

    d.pop("encoder.atmos_token_embeds.weight_new", None)

    for level in _POLLUTION_LEVELS:
        ls = level_to_str(level)
        d.pop(f"encoder.atmos_token_embeds_new.layers.{ls}.weight", None)

        n1 = f"encoder.atmos_token_embeds_new.layers.{ls}.weight_new"
        if n1 in d:
            weight = d.pop(n1)
            assert weight.shape[1] == 5
            for i, name in enumerate(("co", "no", "no2", "go3", "so2")):
                d[f"encoder.atmos_token_embeds.layers.{ls}.weights.{name}"] = weight[:, [i]]

        # The original implementation indexes `z` through `static_z`'s embedding.
        d[f"encoder.atmos_token_embeds.layers.{ls}.weights.z"] = d[
            f"encoder.atmos_token_embeds.layers.{ls}.weights.static_z"
        ]

        n1 = f"encoder.atmos_token_embeds_new.layers.{ls}.bias"
        n2 = f"encoder.atmos_token_embeds.layers.{ls}.bias"
        if n1 in d:
            assert n2 in d
            d[n2] = d[n2] + d.pop(n1)  # Two original instances → biases add.

        d.pop(f"encoder.atmos_token_embeds_new.layers.{ls}.weight_new2", None)

    for name in ("2t", "10u", "10v", "msl"):
        d.pop(f"surf_feature_combiner.{name}.weight", None)
        d.pop(f"surf_feature_combiner.{name}.bias", None)
    for name in ("z", "u", "v", "t", "q"):
        d.pop(f"atmos_feature_combiner.{name}.weight", None)
        d.pop(f"atmos_feature_combiner.{name}.bias", None)

    for k in list(d):
        if k.startswith("decoder.level_decoder_new"):
            d["decoder.level_decoder_alternate" + k.removeprefix("decoder.level_decoder_new")] = (
                d.pop(k)
            )

    if "decoder.surf_head_new.weight" in d:
        weight = d.pop("decoder.surf_head_new.weight")
        bias = d.pop("decoder.surf_head_new.bias")
        n = 8
        weight = weight.reshape(patch_size**2, n, -1)
        bias = bias.reshape(patch_size**2, n)
        for i, name in enumerate(
            ("pm1", "pm2p5", "pm10", "tcco", "tc_no", "tcno2", "gtco3", "tcso2")
        ):
            d[f"decoder.surf_heads.{name}.weight"] = weight[:, i]
            d[f"decoder.surf_heads.{name}.bias"] = bias[:, i]

    if "decoder.surf_head_mod.weight" in d:
        weight = d.pop("decoder.surf_head_mod.weight")
        bias = d.pop("decoder.surf_head_mod.bias")
        n = 4 + 8
        weight = weight.reshape(patch_size**2, n, -1)
        bias = bias.reshape(patch_size**2, n)
        pollution = ("pm1", "pm2p5", "pm10", "tcco", "tc_no", "tcno2", "gtco3", "tcso2")
        for i, name in enumerate(("2t", "10u", "10v", "msl") + pollution):
            if name in pollution:
                d[f"decoder.surf_heads.{name}_mod.weight"] = weight[:, i]
                d[f"decoder.surf_heads.{name}_mod.bias"] = bias[:, i]

    for suffix in ("", "_mod"):
        for level in _POLLUTION_LEVELS:
            k_w = f"decoder.atmos_head{suffix}.layers.{level}.weight"
            if k_w in d:
                weight = d.pop(k_w)
                bias = d.pop(f"decoder.atmos_head{suffix}.layers.{level}.bias")
                if suffix != "_mod":
                    weight = weight.reshape(patch_size**2, 5, -1)
                    bias = bias.reshape(patch_size**2, 5)
                    for i, v in enumerate(("z", "u", "v", "t", "q")):
                        d[f"decoder.atmos_heads.{v}{suffix}.layers.{level}.weight"] = weight[:, i]
                        d[f"decoder.atmos_heads.{v}{suffix}.layers.{level}.bias"] = bias[:, i]

            k_w = f"decoder.atmos_head{suffix}_new.layers.{level}.weight"
            if k_w in d:
                weight = d.pop(k_w)
                bias = d.pop(f"decoder.atmos_head{suffix}_new.layers.{level}.bias")
                weight = weight.reshape(patch_size**2, 5, -1)
                bias = bias.reshape(patch_size**2, 5)
                for i, v in enumerate(("co", "no", "no2", "go3", "so2")):
                    d[f"decoder.atmos_heads.{v}{suffix}.layers.{level}.weight"] = weight[:, i]
                    d[f"decoder.atmos_heads.{v}{suffix}.layers.{level}.bias"] = bias[:, i]
    return d


def adapt_checkpoint_wave(patch_size: int, d: dict) -> dict:
    """Wave checkpoint renames (mirrors reference compat.py:273-284)."""
    d = dict(d)
    for n1, n2 in [(".k_ln.", ".ln_k."), (".q_ln.", ".ln_q.")]:
        for k in list(d):
            if n1 in k:
                d[k.replace(n1, n2)] = d.pop(k)
    return d


def adapt_max_history_size(d: dict, max_history_size: int) -> dict:
    """Zero-pad the history axis of encoder patch embeddings for a model with a larger
    ``max_history_size`` (mirrors reference aurora/model/aurora.py:469-504)."""
    d = dict(d)
    for name, weight in list(d.items()):
        if name.startswith("encoder.surf_token_embeds.weights.") or name.startswith(
            "encoder.atmos_token_embeds."
        ) and ".weights." in name:
            if weight.ndim != 5:
                continue
            T = weight.shape[2]
            if T > max_history_size:
                raise AssertionError(
                    f"Cannot load checkpoint with `max_history_size` {T} into model "
                    f"with `max_history_size` {max_history_size}."
                )
            if T < max_history_size:
                new = np.zeros(
                    (weight.shape[0], 1, max_history_size, *weight.shape[3:]),
                    dtype=np.asarray(weight).dtype,
                )
                new[:, :, :T] = weight
                d[name] = new
    return d


def tree_path_shapes(tree, prefix="") -> dict[str, tuple]:
    """Flatten a parameter (or ShapeDtypeStruct) tree into ``{path: shape}``."""
    out: dict[str, tuple] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(tree_path_shapes(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(tree_path_shapes(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = tuple(tree.shape)
    return out


def validate_params(params, cfg: AuroraConfig) -> dict[str, list[str]]:
    """Structurally compare a converted tree against this config's ``init_params``.

    Returns ``{"missing": [...], "unexpected": [...], "mismatched": [...]}`` — all
    empty iff the checkpoint covers the model exactly. Shape inference runs under
    ``jax.eval_shape`` so no parameter memory is allocated.
    """
    import jax

    from aurora_tpu.model.aurora import init_params

    want = tree_path_shapes(
        jax.eval_shape(lambda k: init_params(k, cfg), jax.random.PRNGKey(0))
    )
    got = tree_path_shapes(params)
    return {
        "missing": sorted(set(want) - set(got)),
        "unexpected": sorted(set(got) - set(want)),
        "mismatched": sorted(
            f"{k}: ckpt{got[k]} vs model{want[k]}"
            for k in set(want) & set(got)
            if want[k] != got[k]
        ),
    }


def convert_reference_checkpoint(
    sd: Mapping[str, np.ndarray],
    cfg: AuroraConfig,
    dtype=jnp.float32,
    strict: bool = True,
    leaf_fn=None,
) -> dict:
    """Schema-migrate + convert a raw reference state dict into a parameter pytree.

    ``strict=True`` validates the result 1:1 against the model's own parameter
    structure (missing / unexpected / shape-mismatched paths raise). LoRA banks are
    exempt when the config enables LoRA but the file predates it — the reference
    documents the same ``strict=False``-for-LoRA contract (docs/finetuning.md).
    """
    sd = adapt_checkpoint_pretrained(cfg.patch_size, sd)
    if cfg.variant == "air_pollution":
        sd = adapt_checkpoint_air_pollution(cfg.patch_size, sd)
    elif cfg.variant == "wave":
        sd = adapt_checkpoint_wave(cfg.patch_size, sd)
    sd = adapt_max_history_size(sd, cfg.max_history_size)

    params = convert_torch_state_dict(sd, cfg, dtype=dtype, leaf_fn=leaf_fn)
    if strict:
        problems = validate_params(params, cfg)
        if cfg.use_lora:
            problems["missing"] = [p for p in problems["missing"] if "lora" not in p]
        msgs = [f"{kind}: {v}" for kind, v in problems.items() if v]
        if msgs:
            raise ValueError(
                "checkpoint does not match the model parameter structure;\n"
                + "\n".join(msgs)
            )
    return params


def load_torch_checkpoint(
    path: str,
    cfg: AuroraConfig,
    dtype=jnp.float32,
    strict: bool = True,
) -> dict:
    """Load a reference ``.ckpt`` file and convert it into a parameter pytree.

    Equivalent of reference ``Aurora.load_checkpoint_local`` (aurora.py:432-456):
    runs the schema migrations for the variant, adapts the history size, converts,
    and (``strict=True``) validates the tree against the model structure.
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in raw.items()}
    return convert_reference_checkpoint(sd, cfg, dtype=dtype, strict=strict)


def load_checkpoint(
    model,
    repo: str | None = None,
    name: str | None = None,
    revision: str | None = None,
    dtype=jnp.float32,
    strict: bool = True,
) -> dict:
    """Download a released checkpoint from the HF hub and convert it.

    Equivalent of reference ``Aurora.load_checkpoint`` (aurora.py:409-430): resolves the
    per-variant default (repo, file, pinned revision) from the model class, downloads via
    ``huggingface_hub`` (cached), and converts with :func:`load_torch_checkpoint`.
    Requires network access on first use.
    """
    from huggingface_hub import hf_hub_download

    repo = repo or getattr(model, "default_checkpoint_repo", "microsoft/aurora")
    name = name or model.default_checkpoint_name
    revision = revision or model.default_checkpoint_revision
    path = hf_hub_download(repo_id=repo, filename=name, revision=revision)
    return load_torch_checkpoint(path, model.cfg, dtype=dtype, strict=strict)


# --------------------------------------------------------------------- native I/O


def save_params(params, path: str) -> None:
    """Save a parameter pytree with Orbax (sharding-aware, async-capable)."""
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def restore_params(path: str, like=None):
    """Restore a parameter pytree saved by :func:`save_params`."""
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)  # Orbax requires absolute paths
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, like) if like is not None else ckptr.restore(path)


def save_train_state(path: str, params, opt_state, step: int = 0) -> None:
    """Save a full training state (params + optimiser state + step) with Orbax.

    The reference has no training persistence at all (load-only checkpoints,
    SURVEY §5); this provides the resume story for long fine-tunes. ``opt_state``
    is any optax state pytree (AdamW moments, ``optax.masked`` wrappers,
    ``MultiSteps`` counters, ...).
    """
    import os

    import jax.numpy as _jnp
    import orbax.checkpoint as ocp

    state = {"params": params, "opt_state": opt_state, "step": _jnp.asarray(step, _jnp.int32)}
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def restore_train_state(path: str, like_params, like_opt_state):
    """Restore ``(params, opt_state, step)`` saved by :func:`save_train_state`.

    ``like_params`` / ``like_opt_state`` provide the tree structure (build them with
    ``model.init`` + ``optimizer.init``) so optax's NamedTuple state types survive
    the round trip; restored arrays adopt their shardings when restoring under a
    mesh.
    """
    import os

    import jax.numpy as _jnp
    import orbax.checkpoint as ocp

    like = {
        "params": like_params,
        "opt_state": like_opt_state,
        "step": _jnp.asarray(0, _jnp.int32),
    }
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(os.path.abspath(path), like)
    return out["params"], out["opt_state"], int(out["step"])
