"""Command-line driver: run forecasts and score them from the shell.

The reference is library-only (no CLI); this closes the loop for operational use:

    python -m aurora_tpu forecast --model AuroraSmallPretrained --hf \\
        --input 2023-01-01T00.nc --steps 40 --output-dir preds/

    python -m aurora_tpu evaluate --pred preds/prediction-003.nc \\
        --target analysis_t3.nc --climatology clim.nc

``forecast`` reads the initial condition as a netCDF :class:`Batch`
(``Batch.to_netcdf`` format), loads weights from a local reference ``.ckpt`` / an
Orbax directory / the HF hub, runs :func:`aurora_tpu.rollout`, and writes each
step as ``prediction-{i:03d}.nc`` (the serving stack's naming,
foundry/channel.py::iterate_prediction_files). ``evaluate`` prints one JSON line
of latitude-weighted scores per variable (aurora_tpu/metrics.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


class CLIError(Exception):
    """A user-facing CLI failure (bad path, bad flag combination); exits with code 2."""


def _model_registry():
    import aurora_tpu as a

    names = (
        "Aurora",
        "AuroraPretrained",
        "AuroraSmallPretrained",
        "AuroraSmall",
        "Aurora12hPretrained",
        "AuroraHighRes",
        "AuroraAirPollution",
        "AuroraWave",
    )
    return {n: getattr(a, n) for n in names}


def _load_params(args, model):
    import jax

    from aurora_tpu import cast_backbone_params, checkpoint

    if args.random_init:
        params = model.init(jax.random.PRNGKey(args.seed))
    elif args.checkpoint:
        if not os.path.exists(args.checkpoint):
            raise CLIError(f"checkpoint not found: {args.checkpoint}")
        if os.path.isdir(args.checkpoint):
            params = checkpoint.restore_params(args.checkpoint)
        else:
            params = checkpoint.load_torch_checkpoint(args.checkpoint, model.cfg)
    elif args.hf:
        # Explicit --hf: the variant's pinned HF repo/revision.
        params = checkpoint.load_checkpoint(model)
    else:
        # No source given: the HF hub is the default. Kept as a separate branch
        # from --hf so the flag stays correct if this default ever changes.
        params = checkpoint.load_checkpoint(model)
    if model.cfg.autocast and not args.no_bf16_backbone:
        params = cast_backbone_params(params)
    # Scan-over-blocks layout: bit-identical outputs, ~4.5× less compiled
    # program text and minutes less compile latency per grid geometry — the
    # right default for a CLI that compiles fresh per invocation.
    from aurora_tpu import stack_block_params

    params = stack_block_params(params)
    return params


def cmd_forecast(args) -> int:
    from aurora_tpu import Batch, rollout
    from aurora_tpu.foundry.channel import iterate_prediction_files
    from aurora_tpu.tracker import Tracker

    registry = _model_registry()
    if args.model not in registry:
        print(f"unknown model {args.model!r}; choose from {sorted(registry)}", file=sys.stderr)
        return 2
    model = registry[args.model]()

    batch = Batch.from_netcdf(args.input)
    params = _load_params(args, model)
    os.makedirs(args.output_dir, exist_ok=True)

    tracker = None
    if args.track:
        if args.init_lat is None or args.init_lon is None:
            print("--track requires --init-lat and --init-lon", file=sys.stderr)
            return 2
        tracker = Tracker(args.init_lat, args.init_lon, batch.metadata.time[0])

    names = iterate_prediction_files("prediction.nc", args.steps)
    for i, (pred, fname) in enumerate(zip(rollout(model, params, batch, args.steps), names)):
        path = os.path.join(args.output_dir, fname)
        pred.to_numpy().to_netcdf(path)
        if tracker is not None:
            tracker.step(pred)
        print(f"step {i + 1}/{args.steps}: wrote {path}", file=sys.stderr, flush=True)

    if tracker is not None:
        track_path = os.path.join(args.output_dir, "track.csv")
        tracker.results().to_csv(track_path, index=False)
        print(f"wrote {track_path}", file=sys.stderr)
    return 0


def cmd_evaluate(args) -> int:
    import numpy as np

    from aurora_tpu import Batch, metrics

    if len(args.pred) != len(args.target):
        print("--pred and --target need the same number of files", file=sys.stderr)
        return 2
    clim = Batch.from_netcdf(args.climatology) if args.climatology else None

    out = []
    for pred_path, target_path in zip(args.pred, args.target):
        scores = metrics.evaluate(
            Batch.from_netcdf(pred_path), Batch.from_netcdf(target_path), climatology=clim
        )
        # Keyed by group (like metrics.evaluate) so a variable name present in
        # both surf_vars and atmos_vars can never silently overwrite the other.
        nested: dict[str, dict[str, dict[str, float | list]]] = {}
        for group in ("surf_vars", "atmos_vars"):
            nested[group] = {
                var: {
                    k: (
                        # Scalars for surface vars (mean over batch/time),
                        # per-level lists for atmospheric ones.
                        np.asarray(v).mean(axis=tuple(range(np.ndim(v) - 1))).round(6).tolist()
                        if group == "atmos_vars"
                        else round(float(np.asarray(v).mean()), 6)
                    )
                    for k, v in ms.items()
                }
                for var, ms in scores[group].items()
            }
        out.append({"pred": pred_path, "target": target_path, "scores": nested})
    print(json.dumps(out if len(out) > 1 else out[0]))
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="aurora_tpu", description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="command", required=True)

    f = sub.add_parser("forecast", help="autoregressive roll-out from a netCDF initial condition")
    f.add_argument("--model", default="AuroraPretrained", help="variant class name")
    f.add_argument("--input", required=True, help="initial-condition netCDF (Batch format)")
    f.add_argument("--steps", type=int, default=4)
    f.add_argument("--output-dir", required=True)
    src = f.add_mutually_exclusive_group()
    src.add_argument("--checkpoint", help="local reference .ckpt file or Orbax directory")
    src.add_argument("--hf", action="store_true", help="download the variant's HF checkpoint (default)")
    src.add_argument("--random-init", action="store_true", help="random weights (smoke testing)")
    f.add_argument("--seed", type=int, default=0)
    f.add_argument(
        "--no-bf16-backbone",
        action="store_true",
        help="keep f32 backbone weight storage (default casts to bf16 under autocast, "
        "which is bitwise-identical compute and halves weight memory)",
    )
    f.add_argument("--track", action="store_true", help="run the tropical-cyclone tracker")
    f.add_argument("--init-lat", type=float, help="tracker initial latitude")
    f.add_argument("--init-lon", type=float, help="tracker initial longitude")
    f.set_defaults(fn=cmd_forecast)

    e = sub.add_parser("evaluate", help="latitude-weighted scores of prediction vs target netCDFs")
    e.add_argument("--pred", nargs="+", required=True)
    e.add_argument("--target", nargs="+", required=True)
    e.add_argument("--climatology", help="optional climatology netCDF (enables ACC)")
    e.set_defaults(fn=cmd_evaluate)
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return args.fn(args)
    except CLIError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2


if __name__ == "__main__":
    raise SystemExit(main())
