#!/usr/bin/env python
"""Probe the usable VMEM ceiling on the attached TPU.

Compiles a trivial Pallas kernel with increasing VMEM scratch + raised
``vmem_limit_bytes`` until Mosaic refuses, reporting the largest size that
compiles AND runs. Informs tile sizing for the fused block-tail kernels.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_size(mb: int) -> bool:
    n = mb * 2**20 // 4 // 128  # rows of f32 x 128 lanes
    def kernel(x_ref, o_ref, scratch):
        scratch[0, :] = x_ref[0, :]
        o_ref[...] = x_ref[...] * 2.0 + scratch[0, 0]

    try:
        f = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((n, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=(mb + 8) * 2**20
            ),
        )
        x = jnp.ones((8, 128), jnp.float32)
        out = jax.jit(f)(x)
        float(out[0, 0])
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"  {mb} MB: FAIL {type(e).__name__}: {msg}", flush=True)
        return False


def main():
    print(f"device {jax.devices()[0].device_kind}", flush=True)
    ok = 0
    for mb in (16, 32, 48, 64, 80, 96, 112, 120, 127):
        if try_size(mb):
            ok = mb
            print(f"  {mb} MB: ok", flush=True)
        else:
            break
    print(f"max usable VMEM scratch: {ok} MB", flush=True)


if __name__ == "__main__":
    main()
