"""REAL multi-process (multi-host simulation) execution.

Launches tools/multihost_sim.py: two separate Python processes bring up the
jax.distributed runtime (coordinator + gloo collectives — the same machinery a TPU
pod uses over DCN), shard the batch over the 8 GLOBAL devices, run the full
forward, and compare the all-gathered output against a single-process run. This
covers what the in-process virtual mesh cannot: coordinator bring-up
(parallel/distributed.py), cross-process collectives, and host-local -> global
array placement.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def test_two_process_forward_matches_single_process():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # The sim manages its own XLA_FLAGS / platform; drop the test harness's.
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "multihost_sim.py")],
        cwd=repo, env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["ok"], result
    assert result["processes"] == 2
    assert result["max_rel_err_vs_single_process"] < 1e-5
