#!/usr/bin/env python
"""Probe: does Mosaic lower int8 x int8 -> int32 jnp.dot to the MXU's
double-rate int8 mode?  Times an s8 matmul kernel vs the same-shape
bf16 kernel (grid-looped to get out of dispatch noise)."""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(ROOT, ".jax_cache"))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

M, K, N, G = 256, 1024, 256, 512   # G sequential grid steps


def run(dtype, acc_dtype):
    def kernel(a_ref, b_ref, o_ref, acc_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jnp.dot(a_ref[...], b_ref[...],
                                preferred_element_type=acc_dtype)

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            o_ref[...] = acc_ref[...]

    a = jnp.ones((G * M, K), dtype)
    b = jnp.ones((K, N), dtype)
    f = jax.jit(lambda a, b: pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((M, K), lambda j: (j, 0)),
                  pl.BlockSpec((K, N), lambda j: (0, 0))],
        out_specs=pl.BlockSpec((M, N), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
        scratch_shapes=[pltpu.VMEM((M, N), acc_dtype)],
    )(a, b))
    t0 = time.time()
    out = jax.block_until_ready(f(a, b))
    print(f"{dtype.__name__}: compile+first {time.time() - t0:.1f}s, "
          f"out[0,0]={out[0, 0]}", flush=True)
    ts = []
    for _ in range(10):
        t0 = time.time()
        jax.block_until_ready(f(a, b))
        ts.append(time.time() - t0)
    med = sorted(ts)[5]
    flops = 2 * G * M * K * N
    print(f"{dtype.__name__}: median {med * 1e3:.2f} ms "
          f"({flops / med / 1e12:.0f} TOP/s)", flush=True)


for dt, acc in ((jnp.bfloat16, jnp.float32), (jnp.int8, jnp.int32)):
    try:
        run(dt, acc)
    except Exception as e:  # noqa: BLE001
        print(f"{dt.__name__}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
