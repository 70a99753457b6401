#!/usr/bin/env python
"""Microbench: quantized dense one-hot adjacency matmul formulations.

The chunked-ELL path is gather-latency-bound at ~5.5 ns/slot
(scripts/bench_ell_micro.py) — ~180 M edge-messages/s per pool pass no
matter the table size.  A dense one-hot multi-link adjacency
``S[r, d, s] in {0, 1}`` streamed through the MXU has NO gathers at all;
the question is storage + achieved bandwidth:

  bf16   S as bf16            (2 B/entry; ML-10M full = 15 GB: too big)
  int8   S as int8            (1 B/entry; 7.5 GB: fits)   -> does XLA
         fuse the int8->bf16 convert into the dot, or materialize?
  scan8  int8 sliced into dst blocks inside lax.scan (bounds any
         materialized convert to one block)
  bits   S bit-packed along a dst sub-axis (1 bit/entry; 933 MB) with
         an XLA unpack (shift/and) per block -> how much does the
         unpack cost when XLA schedules it?

Shapes default to an ML-10M-sized slice: R=10, D=32768 dst nodes,
S_n=10677 src nodes, F=65 features.  All operands are generated
device-side (the axon tunnel makes multi-GB host transfers slow).
"""

import argparse
import functools
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(ROOT, ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dst", type=int, default=32768)
    ap.add_argument("--src", type=int, default=10677)
    ap.add_argument("--ratings", type=int, default=10)
    ap.add_argument("--units", type=int, default=65)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--blk", type=int, default=4096)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of variants")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import jax.numpy as jnp

    R, D, S_n, F = args.ratings, args.dst, args.src, args.units
    entries = R * D * S_n
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (S_n, F), jnp.bfloat16)

    def timeit(name, build, fn):
        try:
            ops = build()
            f = jax.jit(fn)
            t0 = time.time()
            jax.block_until_ready(f(*ops))
            print(f"{name}: compile+first {time.time() - t0:.1f}s",
                  flush=True)
            ts = []
            for _ in range(args.reps):
                t0 = time.time()
                jax.block_until_ready(f(*ops))
                ts.append(time.time() - t0)
            med = sorted(ts)[len(ts) // 2]
            gbs = entries / med / 1e9
            print(f"{name}: median {med * 1e3:.1f} ms "
                  f"({gbs:.0f} G entries/s)", flush=True)
            del ops
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    if want("bf16"):
        timeit(
            "bf16",
            lambda: ((jax.random.bits(key, (R, D, S_n), jnp.uint8)
                      & 1).astype(jnp.bfloat16),),
            lambda S: jnp.einsum("rds,sf->drf", S, x,
                                 preferred_element_type=jnp.float32))

    if want("int8"):
        timeit(
            "int8",
            lambda: ((jax.random.bits(key, (R, D, S_n), jnp.uint8)
                      & 1).astype(jnp.int8),),
            lambda S: jnp.einsum("rds,sf->drf", S.astype(jnp.bfloat16), x,
                                 preferred_element_type=jnp.float32))

    if want("int8_bwd"):
        g = jax.random.normal(key, (D, R, F), jnp.bfloat16)
        timeit(
            "int8_bwd",
            lambda: ((jax.random.bits(key, (R, D, S_n), jnp.uint8)
                      & 1).astype(jnp.int8),),
            lambda S: jnp.einsum("rds,drf->sf", S.astype(jnp.bfloat16), g,
                                 preferred_element_type=jnp.float32))

    if want("scan8"):
        nblk = -(-D // args.blk)

        def scan_fn(S):
            Sb = S.reshape(R, nblk, args.blk, S_n).transpose(1, 0, 2, 3)

            def body(_, Sblk):
                out = jnp.einsum("rds,sf->drf", Sblk.astype(jnp.bfloat16),
                                 x, preferred_element_type=jnp.float32)
                return None, out.astype(jnp.bfloat16)

            _, outs = jax.lax.scan(body, None, Sb)
            return outs

        timeit(
            "scan8",
            lambda: ((jax.random.bits(key, (R, D, S_n), jnp.uint8)
                      & 1).astype(jnp.int8),),
            scan_fn)

    if want("bits"):
        # Pack 8 dst rows per byte: P[r, d8, s] bit b = S[r, d8*8+b, s].
        # Unpack per block with shift/and, matmul per bit plane.
        nblk = -(-D // args.blk)
        bpb = args.blk // 8

        def bits_fn(P):
            Pb = P.reshape(R, nblk, bpb, S_n).transpose(1, 0, 2, 3)

            def body(_, Pblk):
                outs = []
                for b in range(8):
                    Sb = ((Pblk >> b) & 1).astype(jnp.bfloat16)
                    outs.append(jnp.einsum(
                        "rds,sf->drf", Sb, x,
                        preferred_element_type=jnp.float32))
                return None, jnp.stack(outs, 1).astype(jnp.bfloat16)

            _, outs = jax.lax.scan(body, None, Pb)
            return outs

        timeit(
            "bits",
            lambda: (jax.random.bits(key, (R, D // 8, S_n), jnp.uint8),),
            bits_fn)

    if want("int4"):
        timeit(
            "int4",
            lambda: ((jax.random.bits(key, (R, D, S_n), jnp.uint8)
                      & 1).astype(jnp.int4),),
            lambda S: jnp.einsum("rds,sf->drf", S.astype(jnp.bfloat16), x,
                                 preferred_element_type=jnp.float32))


if __name__ == "__main__":
    main()
