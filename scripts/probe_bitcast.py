#!/usr/bin/env python
"""Probe pltpu.bitcast u8->u16 pairing semantics on real hardware.

The 16-bit-lane bitdense kernels need to know which two uint8 elements
land in one u16 lane (adjacent minor-dim pair? sublane pair? tiled?).
Fills a (32, 256) uint8 array with v[m, s] = (m * 8 + s // 32) % 256 —
distinct per (row, column-group) — bitcasts in a Pallas kernel, and
prints the (low, high) byte origin of a few u16 lanes.
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(ROOT, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

M, S = 32, 256
v = (np.arange(M)[:, None] * 8 + np.arange(S)[None, :] // 32) % 251
v = v.astype(np.uint8)

for out_shape in [(M, S // 2), (M // 2, S)]:
    def kernel(x_ref, o_ref):
        o_ref[...] = pltpu.bitcast(x_ref[...], jnp.uint16)

    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.uint16),
        )(jnp.asarray(v))
        out = np.asarray(out)
        print(f"out_shape {out_shape}: OK", flush=True)
        # decode a few lanes
        for (i, j) in [(0, 0), (0, 1), (1, 0), (3, 5)]:
            lane = int(out[i, j])
            lo, hi = lane & 0xFF, lane >> 8
            print(f"  out[{i},{j}] = lo {lo} hi {hi}", flush=True)
        # search which (m, s) pairs these correspond to
        lo0, hi0 = int(out[0, 0]) & 0xFF, int(out[0, 0]) >> 8
        cand_lo = np.argwhere(v == lo0)[:4]
        cand_hi = np.argwhere(v == hi0)[:4]
        print(f"  lane(0,0) lo candidates {cand_lo.tolist()} "
              f"hi candidates {cand_hi.tolist()}", flush=True)
        break
    except Exception as e:  # noqa: BLE001
        print(f"out_shape {out_shape}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
