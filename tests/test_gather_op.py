"""take_rows: scatter-free gather gradients == jnp.take gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stargcn_tpu.ops.gather import take_rows


@pytest.mark.parametrize("n,chunk", [(50, 8192), (50, 16), (1000, 128)])
def test_take_rows_matches_take(n, chunk):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(n, 7)).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, 33).astype(np.int32))
    cot = jnp.asarray(rng.normal(size=(33, 7)).astype(np.float32))

    np.testing.assert_array_equal(np.asarray(take_rows(x, idx, chunk)),
                                  np.asarray(jnp.take(x, idx, axis=0)))

    g_mm = jax.grad(lambda v: (take_rows(v, idx, chunk) * cot).sum())(x)
    g_sc = jax.grad(lambda v: (jnp.take(v, idx, axis=0) * cot).sum())(x)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_sc),
                               rtol=1e-5, atol=1e-6)


def test_take_rows_bf16_and_jit():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.normal(size=(257, 5)).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 257, 64).astype(np.int32))

    @jax.jit
    def loss(v):
        return (take_rows(v.astype(jnp.bfloat16), idx, 64)
                .astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss)(x)
    assert g.dtype == jnp.float32
    g_ref = jax.grad(lambda v: (jnp.take(
        v.astype(jnp.bfloat16), idx, axis=0).astype(jnp.float32)
        ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-2, atol=1e-2)
