#!/usr/bin/env python
"""Vendor the released-checkpoint key manifest (names + shapes) for all variants.

The released HF checkpoints cannot be downloaded in this environment; this tool
derives the exact post-schema-migration key manifest from the reference model
classes themselves (reference ``load_checkpoint`` ends in ``load_state_dict`` with
``strict=True`` — aurora/model/aurora.py:456 — so the adapted released file must
produce *exactly* the model's ``state_dict()`` keys/shapes). The manifest is written
to ``tests/data/ckpt_manifests.json`` and consumed by
``tests/test_ckpt_manifest.py``, which asserts our converter maps every key 1:1
onto the native parameter tree for every variant.

Models are constructed on the torch ``meta`` device: shapes only, no memory.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import torch  # noqa: E402

from tests.conftest import load_reference  # noqa: E402

VARIANTS = [
    "Aurora",
    "AuroraSmallPretrained",
    "Aurora12hPretrained",
    "AuroraHighRes",
    "AuroraAirPollution",
    "AuroraWave",
]


def main():
    ref = load_reference()
    out = {}
    # The reference's drop-path setup calls .item() on a linspace, which meta
    # tensors reject — pin linspace to CPU (it carries no parameters).
    orig_linspace = torch.linspace
    torch.linspace = lambda *a, **k: orig_linspace(*a, **{**k, "device": "cpu"})
    for name in VARIANTS:
        cls = getattr(ref, name)
        with torch.device("meta"):
            model = cls()
        sd = model.state_dict()
        out[name] = {k: list(v.shape) for k, v in sd.items()}
        print(f"{name}: {len(sd)} keys")
        del model, sd

    path = Path(__file__).resolve().parent.parent / "tests" / "data" / "ckpt_manifests.json"
    path.parent.mkdir(exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
