#!/usr/bin/env python
"""Hardware tolerance check for the Pallas ELL kernels.

Runs the REAL (non-interpret) Mosaic kernels on the ambient accelerator
and compares forward + custom-vjp gradients against the XLA reference
formulation, printing one JSON line of max abs/rel errors.  Consumed by
``tests/test_pallas_hw.py`` (env-gated: the pytest process itself is
pinned to CPU by conftest, so the chip run happens in this clean
subprocess) and usable standalone:

    python scripts/pallas_hw_check.py [D S K F]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from stargcn_tpu.ops.pallas_kernels import (ell_sddmm, ell_spmm,
                                                ell_spmm_transpose,
                                                ref_ell_sddmm, ref_ell_spmm)

    D, S, K, F = (int(x) for x in (sys.argv[1:5] or (512, 700, 8, 96)))
    rng = np.random.RandomState(0)
    idx = rng.randint(0, S, size=(D, K)).astype(np.int32)
    w = rng.normal(size=(D, K)).astype(np.float32)
    w[rng.uniform(size=(D, K)) < 0.3] = 0.0  # padded slots
    vals = rng.normal(size=(S, F)).astype(np.float32)
    q = rng.normal(size=(D, F)).astype(np.float32)
    cot = rng.normal(size=(D, F)).astype(np.float32)

    def err(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        abs_e = float(np.abs(a - b).max())
        rel_e = float(abs_e / max(np.abs(b).max(), 1e-12))
        return {"abs": abs_e, "rel": rel_e}

    out = {"platform": jax.default_backend(),
           "shape": f"D={D} S={S} K={K} F={F}"}

    # forward SpMM (real kernel) vs XLA reference
    got = ell_spmm(jnp.asarray(vals), jnp.asarray(idx), jnp.asarray(w))
    out["spmm_fwd"] = err(got, ref_ell_spmm(vals, idx, w))

    # custom-vjp gradient vs jax.grad of the XLA reference
    def loss_pallas(v):
        return (ell_spmm(v, jnp.asarray(idx), jnp.asarray(w))
                * jnp.asarray(cot)).sum()

    def xla_spmm(v):
        # the XLA gather formulation the sampled-mode backend uses
        return (jnp.asarray(w)[..., None] * v[jnp.asarray(idx)]).sum(1)

    def loss_ref(v):
        return (xla_spmm(v) * jnp.asarray(cot)).sum()

    g_p = jax.grad(loss_pallas)(jnp.asarray(vals))
    g_r = jax.grad(loss_ref)(jnp.asarray(vals))
    out["spmm_dvalues"] = err(g_p, g_r)

    # SDDMM kernel vs reference
    got = ell_sddmm(jnp.asarray(q), jnp.asarray(vals), jnp.asarray(idx))
    out["sddmm"] = err(got, ref_ell_sddmm(q, vals, idx))

    # transpose-scatter kernel vs the reference adjoint (one-hot matmul)
    got = ell_spmm_transpose(jnp.asarray(cot), jnp.asarray(idx),
                             jnp.asarray(w), S)
    onehot = np.zeros((D * K, S), np.float32)
    onehot[np.arange(D * K), idx.reshape(-1)] = w.reshape(-1)
    ref = onehot.reshape(D, K, S).sum(1).T @ cot
    out["spmm_transpose"] = err(got, ref)

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
