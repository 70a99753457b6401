"""Row gathers with matmul (scatter-free) gradients.

``jnp.take(x, idx, axis=0)`` differentiates to a scatter-add over
``x``'s rows.  XLA lowers scatter on this TPU runtime to a serialized
per-row loop measured at ~5 us/row (an xplane trace of the wide-width
training step attributed 91 of 133 ms/step to FOUR such scatters of
just 4096 rows each — the rating-head gradients).  The MXU streams the
same computation as a one-hot matmul in microseconds, so this module's
``take_rows`` keeps the cheap gather forward and rewrites the backward
as ``dx = one_hot(idx)^T @ g`` — pure dot-general work, chunked over
the row dimension so the one-hot never materialises more than
``bwd_chunk x B`` at a time.

Cost model: backward FLOPs are ``2 * N * B * F`` (vs the scatter's
``B * F`` adds) — a >=100x FLOP overspend that is still a >=10x
wall-clock WIN whenever ``N * B`` MACs fit comfortably in an MXU
microsecond budget (N*B <= ~10^9).  For bigger products fall back to
``jnp.take``.

Reference context: the reference's CUDA seg ops implement their
adjoints as hand-written atomic-add scatter kernels
(``seg_ops_cuda/mxnet_op/seg_op.cu:166-280``); on TPU the systolic
array IS the scatter engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# Above this many one-hot elements (B * N), the matmul formulation's
# FLOP/memory overspend stops paying for the scatter it avoids — and at
# ML-10M full-batch shapes (1e5 x 7e5 segments) XLA additionally
# materialized the whole chunked one-hot stack at once (140 GB compile
# OOM).  Callers transparently fall back to the native scatter path.
ONEHOT_BUDGET = 1 << 32


def take_rows(x, idx, bwd_chunk: int = 8192):
    """Size-gated dispatcher: the one-hot-backward gather for small
    index products, plain ``jnp.take`` (scatter backward) beyond
    ``ONEHOT_BUDGET`` one-hot elements."""
    if x.shape[0] * idx.shape[0] > ONEHOT_BUDGET:
        return jnp.take(x, idx, axis=0)
    return _take_rows_mm(x, idx, bwd_chunk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _take_rows_mm(x, idx, bwd_chunk: int = 8192):
    """``x[idx]`` with a scatter-free (one-hot matmul) gradient.

    Args:
      x: ``(N, F)`` float array.
      idx: ``(B,)`` int32 row indices (must be in range — clamp first).
      bwd_chunk: row-block size of the backward's chunked one-hot
        contraction (VMEM/HBM peak is ``bwd_chunk * B`` one-hot
        elements plus a ``(bwd_chunk, F)`` output slab per step).
    """
    return jnp.take(x, idx, axis=0)


def _take_rows_fwd(x, idx, bwd_chunk):
    # residuals must be JAX types: a zero-size array carries x's dtype
    proto = jnp.zeros((0,), x.dtype)
    return jnp.take(x, idx, axis=0), (idx, x.shape[0], proto)


def _take_rows_bwd(bwd_chunk, res, g):
    idx, n_rows, proto = res
    n_rows = int(n_rows)
    dtype = proto.dtype
    B = idx.shape[0]
    F = g.shape[-1]
    g2 = g.reshape(B, F)
    if n_rows <= bwd_chunk:
        onehot = (idx[:, None] == jnp.arange(n_rows, dtype=idx.dtype)
                  [None, :]).astype(g2.dtype)
        dx = jnp.einsum("bn,bf->nf", onehot, g2,
                        preferred_element_type=jnp.float32)
        return dx.astype(dtype), None
    n_pad = -(-n_rows // bwd_chunk) * bwd_chunk
    starts = jnp.arange(n_pad // bwd_chunk, dtype=idx.dtype) * bwd_chunk

    def block(_, start):
        rows = start + jnp.arange(bwd_chunk, dtype=idx.dtype)
        onehot = (idx[:, None] == rows[None, :]).astype(g2.dtype)
        return None, jnp.einsum("bn,bf->nf", onehot, g2,
                                preferred_element_type=jnp.float32)

    _, slabs = jax.lax.scan(block, None, starts)
    dx = slabs.reshape(n_pad, F)[:n_rows]
    return dx.astype(dtype), None


_take_rows_mm.defvjp(_take_rows_fwd, _take_rows_bwd)


@functools.partial(jax.jit, static_argnums=(2, 3), inline=True)
def onehot_segment_sum(x, seg, num_segments: int, chunk: int = 8192):
    """``jax.ops.segment_sum(x, seg, num_segments)`` as a chunked
    one-hot contraction — the forward-scatter twin of ``take_rows``'s
    backward (same pathology: XLA's scatter-add serializes per row on
    this TPU runtime; the rank-B REMOVE_RATING corrections measured
    ~19 ms/step as scatters and ~3 ms as MXU dots at widesweep shapes).

    Args:
      x: ``(B, F)`` values (``(B,)`` is treated as ``(B, 1)``).
      seg: ``(B,)`` int32 segment ids (out-of-range rows drop).
      num_segments: output row count.
      chunk: segment-block size of the contraction.

    The gradient of this op is a gather (autodiff of the dot) — also
    scatter-free.
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    B, F = x.shape
    if B * num_segments > ONEHOT_BUDGET:
        out = jax.ops.segment_sum(x, seg, num_segments=num_segments)
        return out[:, 0] if squeeze else out
    if num_segments <= chunk:
        onehot = (seg[:, None] == jnp.arange(num_segments,
                                             dtype=seg.dtype)
                  [None, :]).astype(x.dtype)
        out = jnp.einsum("bn,bf->nf", onehot, x,
                         preferred_element_type=jnp.float32)
    else:
        n_pad = -(-num_segments // chunk) * chunk
        starts = jnp.arange(n_pad // chunk, dtype=seg.dtype) * chunk

        def block(_, start):
            rows = start + jnp.arange(chunk, dtype=seg.dtype)
            onehot = (seg[:, None] == rows[None, :]).astype(x.dtype)
            return None, jnp.einsum("bn,bf->nf", onehot, x,
                                    preferred_element_type=jnp.float32)

        _, slabs = jax.lax.scan(block, None, starts)
        out = slabs.reshape(n_pad, F)[:num_segments]
    out = out.astype(x.dtype)
    return out[:, 0] if squeeze else out
