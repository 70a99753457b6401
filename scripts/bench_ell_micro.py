#!/usr/bin/env python
"""Microbench: chunked-ELL pool forward vs backward, per direction.

Isolates ``ops/chunked_ell.ell_pool_rated`` at ML-10M dimensions to
attribute full-step time (scripts/bench_ml10m.py) between:

  fwd(user)  gather item rows  (small table)  -> per-user pooled
  fwd(item)  gather user rows  (~18 MB table) -> per-item pooled
  bwd(user)  gather from (num_users*R, F) flat cotangent table (~181 MB)
  bwd(item)  gather from (num_items*R, F) flat cotangent table (~28 MB)

Usage::

    python scripts/bench_ell_micro.py [--edges 10000000] [--units 64]
        [--reps 10] [--ell_k 64] [--ell_chunk 16384]
"""

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(ROOT, ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--users", type=int, default=69_878)
    ap.add_argument("--items", type=int, default=10_677)
    ap.add_argument("--units", type=int, default=64)
    ap.add_argument("--ratings", type=int, default=10)
    ap.add_argument("--ell_k", type=int, default=64)
    ap.add_argument("--ell_chunk", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import jax.numpy as jnp
    import numpy as np

    from stargcn_tpu.ops.chunked_ell import build_chunked_ell, ell_pool_rated

    rng = np.random.RandomState(0)
    E, Nu, Ni, R = args.edges, args.users, args.items, args.ratings
    F = args.units + 1
    eu = rng.randint(0, Nu, E).astype(np.int32)
    ei = rng.randint(0, Ni, E).astype(np.int32)
    er = rng.randint(0, R, E).astype(np.int32)

    t0 = time.time()
    pack_u = build_chunked_ell(ei, eu, er, num_src=Ni, num_dst=Nu,
                               K=args.ell_k)
    pack_i = build_chunked_ell(eu, ei, er, num_src=Nu, num_dst=Ni,
                               K=args.ell_k)
    print(f"pack build: {time.time() - t0:.2f}s  "
          f"V_u={pack_u.src_idx.shape[0]} V_i={pack_i.src_idx.shape[0]}",
          flush=True)

    x_item = jnp.asarray(rng.randn(Ni + 1, F).astype(np.float32))
    x_item = x_item.at[-1].set(0.0)
    x_user = jnp.asarray(rng.randn(Nu + 1, F).astype(np.float32))
    x_user = x_user.at[-1].set(0.0)

    ju = {k: jnp.asarray(v) for k, v in
          dict(idx=pack_u.src_idx, rat=pack_u.rating,
               row=pack_u.row_dst).items()}
    ji = {k: jnp.asarray(v) for k, v in
          dict(idx=pack_i.src_idx, rat=pack_i.rating,
               row=pack_i.row_dst).items()}

    def pool_user(x):       # dst = user, src = item
        return ell_pool_rated(x, ju["idx"], ju["rat"], ju["row"],
                              ji["idx"], ji["rat"], ji["row"],
                              Nu, Ni, R, args.ell_chunk)

    def pool_item(x):       # dst = item, src = user
        return ell_pool_rated(x, ji["idx"], ji["rat"], ji["row"],
                              ju["idx"], ju["rat"], ju["row"],
                              Ni, Nu, R, args.ell_chunk)

    def timeit(name, fn, *xs):
        f = jax.jit(fn)
        t0 = time.time()
        out = jax.block_until_ready(f(*xs))
        print(f"{name}: compile+first {time.time() - t0:.1f}s", flush=True)
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            jax.block_until_ready(f(*xs))
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: median {med * 1e3:.1f} ms", flush=True)
        del out
        return med

    f_u = timeit("fwd dst=user", lambda x: pool_user(x).sum(), x_item)
    f_i = timeit("fwd dst=item", lambda x: pool_item(x).sum(), x_user)
    g_u = timeit("fwd+bwd dst=user",
                 lambda x: jax.grad(lambda y: pool_user(y).sum())(x),
                 x_item)
    g_i = timeit("fwd+bwd dst=item",
                 lambda x: jax.grad(lambda y: pool_item(y).sum())(x),
                 x_user)
    print(f"bwd-only est: dst=user {1e3 * (g_u - f_u):.1f} ms, "
          f"dst=item {1e3 * (g_i - f_i):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
