#!/usr/bin/env python
"""Bundle the framework + checkpoints into an MLflow pyfunc model (reference:
package_mlflow.py). Downloads the released checkpoints from the HF hub and logs an
MLflow model whose predict() speaks the foundry wire protocol."""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", default="aurora_tpu_mlflow")
    ap.add_argument(
        "--models",
        nargs="*",
        default=["aurora-0.25-small-pretrained"],
        help="Registered model names to bundle (see aurora_tpu.foundry.models).",
    )
    args = ap.parse_args()

    try:
        import mlflow
    except ImportError:
        sys.exit("mlflow is required: pip install mlflow")

    from huggingface_hub import hf_hub_download

    from aurora_tpu.foundry.models import models
    from aurora_tpu.foundry.server import make_mlflow_wrapper

    artifacts = {}
    for name in args.models:
        served = models[name]
        ckpt = served.model_cls.default_checkpoint_name
        rev = served.model_cls.default_checkpoint_revision
        artifacts[name] = hf_hub_download("microsoft/aurora", ckpt, revision=rev)

    mlflow.pyfunc.save_model(
        path=args.output,
        python_model=make_mlflow_wrapper()(),
        artifacts=artifacts,
        code_paths=["aurora_tpu"],
    )
    print(f"MLflow model written to {args.output}")


if __name__ == "__main__":
    main()
