#!/usr/bin/env python
"""Pallas ELL kernels vs the XLA gather formulation: crossover sweep.

Round 3 measured the Pallas fixed-fanout ELL SpMM LOSING 7.5x at the
production sampled shapes (D~87k, K=8, F=65) and the judge asked for
the other direction: find the (rows, fanout, feature-width) region
where the hand kernel WINS — or demote it.  This sweep times forward
and forward+backward of both formulations over a (D, K, F) grid on the
ambient accelerator and prints one JSON line per point plus a summary
of the winning region.

Usage: python scripts/sweep_pallas_crossover.py [--quick]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np


def _median(xs):
    return sorted(xs)[len(xs) // 2]


def time_fn(fn, *args, iters=6, windows=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / iters)
    return _median(ts)


def main():
    import jax
    import jax.numpy as jnp

    from stargcn_tpu.ops.pallas_kernels import ell_spmm

    quick = "--quick" in sys.argv
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    grid_D = (8192, 32768) if quick else (8192, 32768, 131072)
    grid_K = (8, 32) if quick else (8, 32, 64)
    grid_F = (64, 256) if quick else (64, 256, 512)

    rows = []
    for D in grid_D:
        S = D
        for K in grid_K:
            for F in grid_F:
                rng = np.random.RandomState(0)
                idx = jnp.asarray(
                    rng.randint(0, S, size=(D, K)).astype(np.int32))
                w = jnp.asarray(rng.normal(size=(D, K)).astype(np.float32))
                vals = jnp.asarray(
                    rng.normal(size=(S, F)).astype(np.float32))
                cot = jnp.asarray(
                    rng.normal(size=(D, F)).astype(np.float32))

                @jax.jit
                def pallas_fwd(v, i=idx, ww=w):
                    return ell_spmm(v, i, ww)

                @jax.jit
                def xla_fwd(v, i=idx, ww=w):
                    return (ww[..., None] * jnp.take(v, i, axis=0)).sum(1)

                @jax.jit
                def pallas_fb(v, c=cot, i=idx, ww=w):
                    return jax.grad(
                        lambda x: (ell_spmm(x, i, ww) * c).sum())(v)

                @jax.jit
                def xla_fb(v, c=cot, i=idx, ww=w):
                    return jax.grad(
                        lambda x: ((ww[..., None]
                                    * jnp.take(x, i, axis=0)).sum(1)
                                   * c).sum())(v)

                row = {"D": D, "K": K, "F": F}
                try:
                    row["pallas_fwd_ms"] = round(
                        time_fn(pallas_fwd, vals) * 1e3, 3)
                    row["xla_fwd_ms"] = round(
                        time_fn(xla_fwd, vals) * 1e3, 3)
                    row["pallas_fb_ms"] = round(
                        time_fn(pallas_fb, vals) * 1e3, 3)
                    row["xla_fb_ms"] = round(
                        time_fn(xla_fb, vals) * 1e3, 3)
                    row["fwd_speedup"] = round(
                        row["xla_fwd_ms"] / row["pallas_fwd_ms"], 2)
                    row["fb_speedup"] = round(
                        row["xla_fb_ms"] / row["pallas_fb_ms"], 2)
                except Exception as e:  # OOM / lowering failure
                    row["error"] = f"{type(e).__name__}: {e}"[:200]
                rows.append(row)
                print(json.dumps(row), flush=True)

    wins = [r for r in rows if r.get("fwd_speedup", 0) > 1.0]
    print(json.dumps({
        "summary": "pallas_wins" if wins else "xla_wins_everywhere",
        "win_points": [{k: r[k] for k in ("D", "K", "F", "fwd_speedup",
                                          "fb_speedup")} for r in wins],
        "platform": jax.default_backend(),
    }), flush=True)


if __name__ == "__main__":
    main()
