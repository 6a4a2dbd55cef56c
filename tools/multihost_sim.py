#!/usr/bin/env python
"""REAL multi-process execution of the sharded model (multi-host simulation).

The virtual 8-device mesh in tests exercises the SPMD program shape inside one
process. This harness goes one step further: it launches N separate Python
processes, brings up the `jax.distributed` runtime (the same coordinator/client
machinery a TPU pod uses, with gloo standing in for DCN), shards the batch over the
GLOBAL device mesh with `jax.make_array_from_callback`, runs the full
`forward_core`, and checks the all-gathered output against a single-process run.

This validates the pieces a one-process simulation cannot: coordinator bring-up
(`aurora_tpu/parallel/distributed.py`), cross-process collectives, and host-local →
global array placement.

Usage:
  python tools/multihost_sim.py                 # launcher: reference + 2 workers
  python tools/multihost_sim.py --procs 2       # same, explicit
(Workers are spawned internally with --role worker.)
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PORT = 12355
H, W = 33, 64


def _make_inputs():
    import numpy as np

    from tests.conftest import make_batch

    return make_batch(H=H, W=W, B=2, dtype=np.float32)


def _forward(params, batch, model, mesh=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aurora_tpu.model.aurora import forward_core

    enc = model.prepare_encodings(batch)
    levels = tuple(batch.metadata.atmos_levels)
    step = jnp.asarray(0, jnp.int32)

    if mesh is None:
        surf = {k: jnp.asarray(np.asarray(v)) for k, v in batch.surf_vars.items()}
        static = {k: jnp.asarray(np.asarray(v)) for k, v in batch.static_vars.items()}
        atmos = {k: jnp.asarray(np.asarray(v)) for k, v in batch.atmos_vars.items()}
        return jax.jit(forward_core, static_argnames=("atmos_levels", "cfg"))(
            params, surf, static, atmos, enc, step, atmos_levels=levels, cfg=model.cfg
        )

    from jax.sharding import NamedSharding

    from aurora_tpu.parallel.sharding import ATMOS_SPEC, STATIC_SPEC, SURF_SPEC

    def put(np_arr, spec):
        np_arr = np.asarray(np_arr)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(np_arr.shape, sh, lambda idx: np_arr[idx])

    surf = {k: put(v, SURF_SPEC) for k, v in batch.surf_vars.items()}
    static = {k: put(v, STATIC_SPEC) for k, v in batch.static_vars.items()}
    atmos = {k: put(v, ATMOS_SPEC) for k, v in batch.atmos_vars.items()}
    with jax.set_mesh(mesh):
        params_g = jax.tree_util.tree_map(
            lambda a: put(a, jax.sharding.PartitionSpec()), params
        )
        return jax.jit(forward_core, static_argnames=("atmos_levels", "cfg"))(
            params_g, surf, static, atmos, enc, step, atmos_levels=levels, cfg=model.cfg
        )


def worker(proc_id: int, n_procs: int, out_path: str):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "").split("--xla_force_host_platform_device_count")[0]
        + f" --xla_force_host_platform_device_count={8 // n_procs}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from aurora_tpu.parallel.distributed import initialize

    initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=n_procs,
        process_id=proc_id,
    )
    assert len(jax.devices()) == 8, jax.devices()

    import numpy as np
    from jax.experimental import multihost_utils

    from aurora_tpu import AuroraSmallPretrained
    from aurora_tpu.parallel.mesh import make_mesh

    model = AuroraSmallPretrained()
    params = model.init(jax.random.PRNGKey(0), dtype="float32")
    batch = _make_inputs().crop(model.cfg.patch_size)
    mesh = make_mesh(data=1, lat=2, lon=4)

    out_surf, _ = _forward(params, batch, model, mesh=mesh)
    # Gather the (sharded) output to every host; proc 0 records it.
    gathered = {k: np.asarray(multihost_utils.process_allgather(v, tiled=True))
                for k, v in out_surf.items()}
    if proc_id == 0:
        np.savez(out_path, **gathered)
    multihost_utils.sync_global_devices("done")
    print(f"worker {proc_id}: OK", flush=True)


def launcher(n_procs: int):
    import numpy as np

    # Single-process reference on the virtual mesh-free path.
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from aurora_tpu import AuroraSmallPretrained

    model = AuroraSmallPretrained()
    params = model.init(jax.random.PRNGKey(0), dtype="float32")
    batch = _make_inputs().crop(model.cfg.patch_size)
    ref_surf, _ = _forward(params, batch, model, mesh=None)

    out_path = os.path.join(tempfile.mkdtemp(), "mp_out.npz")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--role", "worker",
             "--proc-id", str(i), "--procs", str(n_procs), "--out", out_path],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(n_procs)
    ]
    rcs = [p.wait(timeout=600) for p in procs]
    assert all(rc == 0 for rc in rcs), f"worker exit codes {rcs}"

    got = np.load(out_path)
    worst = 0.0
    for k in ref_surf:
        a = np.asarray(ref_surf[k])
        b = got[k]
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-30)
        worst = max(worst, float(rel))
    print(json.dumps({
        "metric": "multihost_sim",
        "processes": n_procs,
        "global_devices": 8,
        "max_rel_err_vs_single_process": worst,
        "ok": worst < 1e-5,
    }))
    assert worst < 1e-5, worst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", default="launcher", choices=["launcher", "worker"])
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--proc-id", type=int, default=0)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.role == "worker":
        worker(args.proc_id, args.procs, args.out)
    else:
        launcher(args.procs)


if __name__ == "__main__":
    main()
