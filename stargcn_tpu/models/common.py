"""Activations and initialisers shared by the model layers.

Mirrors ``mxgraph/layers/common.py`` (``get_activation``; 'leaky' =
LeakyReLU(0.1), ``common.py:43-55``) and the reference initialisation
choices (``experiments/STAR-GCN.py:548``: Xavier factor_type='in';
embeddings Uniform(0.1), ``STAR-GCN.py:178``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def get_activation(act):
    """Map an activation name to a callable ('leaky' slope = 0.1)."""
    if act is None or act == "identity" or act == "None":
        return lambda x: x
    if callable(act):
        return act
    return {
        "leaky": lambda x: nn.leaky_relu(x, negative_slope=0.1),
        "relu": nn.relu,
        "elu": nn.elu,
        "sigmoid": nn.sigmoid,
        "tanh": jnp.tanh,
        "softsign": nn.soft_sign,
    }[act]


# MXNet Xavier(factor_type='in', magnitude=3): U(-sqrt(3/fan_in), +...)
# == variance_scaling(1.0, 'fan_in', 'uniform').
xavier_in = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")


def uniform_sym(scale: float):
    """U(-scale, +scale) (mx.init.Uniform semantics)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init
