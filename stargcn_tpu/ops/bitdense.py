"""Bit-packed dense multi-link aggregation — the MXU big-graph backend.

Why this exists: every sparse formulation of the multi-link aggregation
(XLA scatter, chunked-ELL gather) is bound by per-row random access.
Measured on TPU v5e (``scripts/bench_ell_micro.py``), XLA row gathers
cost ~5.5 ns/row no matter how small the table — ~180 M edge-messages/s
per pool pass, period.  The MXU, by contrast, streams dense operands at
hundreds of TFLOP/s; a DENSE one-hot multi-link adjacency

    ``S[r, d, s] = 1  iff  edge (d <- s) with rating level r``

turns the whole aggregation into batched matmuls with NO data-dependent
addressing at all.  The catch is storage: at ML-10M scale
``R x Nu x Ni = 7.5e9`` entries (30 GB f32, 15 GB bf16 — doesn't fit).
Packed at **1 bit per entry** it is 933 MB, and a Pallas kernel can
unpack bit-planes to bf16 tile-by-tile in VMEM and feed the MXU
directly, so the bf16 expansion never touches HBM.

This mirrors what the reference's CUDA kernels chase with shared-memory
tiling (``seg_ops_cuda/mxnet_op/seg_op.cu:573-664``) taken to its
TPU-native conclusion: the adjacency becomes a compile-time-static
quantized operand and the hot loop is pure systolic-array work.

Bit layout (chosen so NO index permutation is ever needed):

    ``P[r * D8 + d8, s]`` bit ``b``  =  ``S[r, b * D8 + d8, s]``

with ``D8 = D_pad / 8``.  Unpacking bit-plane ``b`` of a row block
yields adjacency rows for destinations ``b*D8 + d8`` — i.e. the natural
destination index, provided the output is laid out ``(R, 8, D8, F)``
and reshaped ``(R, 8*D8, F)`` afterwards.

Two packed tensors serve the four passes of one training step per
direction pair (fwd user, fwd item, bwd d_user, bwd d_item): layout A
(users packed, items in lanes) drives fwd-into-users and d_users;
layout B (items packed) the other two.  The backward is wired through
``jax.custom_vjp`` exactly like the chunked-ELL op — each direction's
transpose layout is the other's gradient operand
(cf. ``seg_op.cc:647-712``: the reference registers its seg ops as each
other's adjoints).

Degree normalisation stays OUTSIDE as separable scale vectors and
per-batch REMOVE_RATING stays a rank-B correction, identical to the
dense/ELL paths (``ops/agg.py``, ``ops/chunked_ell.py``) — the packed
adjacency is static per graph variant.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

# Block sizes: BM packed rows (sublane dim; multiple of 32 for uint8
# tiles), BS lane elements per sweep step.  VMEM footprint per step is
# BM*BS (packed block) + BS*F*2 (rhs) + 8*BM*F*4 (accumulator) — well
# under 2 MB at the defaults.
_BM = 128
_BS = 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ------------------------------- packing -------------------------------


def node_pad(n: int, bm: int = _BM, bs: int = _BS) -> int:
    """Padded node count serving BOTH roles of a type: as the packed
    (destination) axis it must be ``8 * (multiple of bm)``; as the lane
    (source) axis a multiple of ``bs``.  One padding per node type keeps
    the forward layout's output length equal to the transpose layout's
    lane length, so the custom-vjp cotangent feeds K2 with no reshape."""
    m = np.lcm(8 * bm, bs)
    return _round_up(max(n, 1), int(m))


def pad_dims(num_dst: int, num_src: int, bm: int = _BM, bs: int = _BS):
    """(D8, D_pad, S_pad) for a packed layout with dst packed 8-deep."""
    d_pad = node_pad(num_dst, bm, bs)
    return d_pad // 8, d_pad, node_pad(num_src, bm, bs)


def pack_bits(edge_dst, edge_src, edge_rating, num_links, num_dst,
              num_src, mask=None, bm: int = _BM, bs: int = _BS,
              interleave: int = 0, row_interleave: int = 0):
    """Bit-pack one direction's multi-link adjacency.

    Returns ``(P, D8)`` with ``P`` of shape ``(num_links * D8, S_pad)``
    uint8, bit ``b`` of ``P[r*D8 + d8, s]`` set iff edge
    ``(dst = b*D8 + d8  <-  src = s)`` carries rating level ``r`` (and
    ``mask > 0``).  Duplicate edges collapse (one-hot semantics, same
    as ``ops/agg.py:build_dense_adjacency``'s min(.,1)).

    ``interleave`` > 0 permutes source columns within blocks of that
    size — logical ``L`` -> physical ``2L`` (first half) /
    ``2(L - half) + 1`` (second half) — so a u16 reinterpretation of a
    physical column pair holds logical columns ``L`` (low byte) and
    ``L + half`` (high byte): a column-pairing layout (kept for
    experiments; the shipped 16-bit kernels use row pairing instead).

    ``row_interleave`` > 0 (= the kernel row-block ``bm``) permutes the
    PACKED-ROW coordinate so the 16-bit kernels' (k, h) accumulator
    order is the natural destination order: within each bm-row block,
    natural position ``w`` maps to physical row ``2*(w % (bm/2)) +
    w // (bm/2)`` — the inverse of the hardware's adjacent-sublane u16
    pairing (``scripts/probe_bitcast.py``).
    """
    d8, _, s_pad = pad_dims(num_dst, num_src, bm, bs)

    from stargcn_tpu.graph import kernels as _K

    native = _K.native_module()
    if native is not None and hasattr(native, "pack_bits"):
        m = None if mask is None else np.ascontiguousarray(mask, np.float32)
        P = native.pack_bits(
            np.ascontiguousarray(edge_dst, np.int32),
            np.ascontiguousarray(edge_src, np.int32),
            np.ascontiguousarray(edge_rating, np.int32),
            m, int(num_links), int(d8), int(s_pad), int(interleave),
            int(row_interleave))
        return P, d8

    edge_dst = np.asarray(edge_dst, np.int64)
    edge_src = np.asarray(edge_src, np.int64)
    edge_rating = np.asarray(edge_rating, np.int64)
    if mask is not None:
        keep = np.asarray(mask) > 0
        edge_dst, edge_src, edge_rating = (
            edge_dst[keep], edge_src[keep], edge_rating[keep])
    if interleave:
        half = interleave // 2
        blk, off = edge_src // interleave, edge_src % interleave
        edge_src = blk * interleave + np.where(
            off < half, 2 * off, 2 * (off - half) + 1)
    P = np.zeros((num_links * d8) * s_pad, np.uint8)
    b = edge_dst // d8
    pos = edge_dst % d8
    if row_interleave:
        halfm = row_interleave // 2
        blk, w = pos // row_interleave, pos % row_interleave
        pos = blk * row_interleave + 2 * (w % halfm) + w // halfm
    flat = (edge_rating * d8 + pos) * s_pad + edge_src
    # One fancy-indexed OR per bit plane: within a plane all writes carry
    # the same value, so duplicate indices are benign.
    for bit in range(8):
        sel = b == bit
        if sel.any():
            P[flat[sel]] |= np.uint8(1 << bit)
    return P.reshape(num_links * d8, s_pad), d8


def build_bit_pack(edge_user, edge_item, edge_rating, edge_mask,
                   num_users, num_items, num_links,
                   bm: int = _BM, bs: int = _BS,
                   row_interleave: int = 0):
    """Both layouts for one graph variant: ``{'user': {...}, 'item':
    {...}}`` where entry ``t`` drives aggregation INTO type ``t``
    (``pf`` = that direction's forward layout, ``pb`` = the transpose
    layout used by its backward)."""
    pa, _ = pack_bits(edge_user, edge_item, edge_rating, num_links,
                      num_users, num_items, mask=edge_mask, bm=bm, bs=bs,
                      row_interleave=row_interleave)
    pb, _ = pack_bits(edge_item, edge_user, edge_rating, num_links,
                      num_items, num_users, mask=edge_mask, bm=bm, bs=bs,
                      row_interleave=row_interleave)
    # Only arrays in the pack: it crosses jit boundaries as a pytree, so
    # scalar metadata would be traced — the d8 values are recovered from
    # the (static) shapes as ``pf.shape[0] // num_links``.
    ja, jb = jnp.asarray(pa), jnp.asarray(pb)
    return {"user": {"pf": ja, "pb": jb},
            "item": {"pf": jb, "pb": ja}}


def resolve_impl(impl: str) -> str:
    """'auto' -> the Pallas kernels on TPU, XLA fallback elsewhere.

    Pack layout and kernel choice must agree ('pallas16' needs
    ``row_interleave=bm`` packs), so every consumer resolves through
    this one function.  The 16-bit-lane kernels measure EQUAL to the
    plain ones at ML-10M scale (~40 ms/pass standalone, ~26 ms composed
    — the pass is MXU-bound, the VPU unpack fully overlaps), so 'auto'
    picks the plain kernels whose packs the XLA fallback can also read.
    """
    if impl != "auto":
        return impl
    return "pallas" if jax.default_backend() == "tpu" else "xla"


# ------------------------------ kernels --------------------------------


def _bit_plane(p32, b):
    """Extract bit plane ``b`` of an int32-widened uint8 block as bf16
    0/1.  Mosaic supports neither uint8->bf16 casts nor the i1 relayout
    from an int8-tiled compare into a bf16 select, so the block is
    widened to i32 once per kernel step and each plane goes
    shift/and -> f32 -> bf16 (all supported transitions)."""
    bit = (p32 >> b) & 1
    return bit.astype(jnp.float32).astype(jnp.bfloat16)


def _k1_kernel(p_ref, x_ref, o_ref, acc_ref):
    """Forward: o[r, b, m, f] = sum_s bit_b(P[(r, m), s]) * x[s, f]."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p32 = p_ref[...].astype(jnp.int32)
    x = x_ref[...].astype(jnp.bfloat16)
    for b in range(8):
        sb = _bit_plane(p32, b)
        acc_ref[b] += jnp.dot(sb, x, preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[0] = acc_ref[...]


def _k1_kernel16(p_ref, x_ref, o_ref, acc_ref):
    """16-bit-lane forward: the uint8 block is REINTERPRETED as u16
    (hardware pairs adjacent sublanes: lane k = packed rows (2k lo,
    2k+1 hi) — probed in scripts/probe_bitcast.py), each of the 16
    (plane, half) extractions is an and/compare/select in the (16, 128)
    tiling i16 and bf16 share — ~2x fewer VPU ops than the i32 widen +
    two-convert chain of ``_k1_kernel``.  The host
    packs rows so the (k, h) output order is the natural dst order
    (``pack_bits(row_interleave=bm)``)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    u = pltpu.bitcast(p_ref[...], jnp.uint16)      # (bm//2, bs)
    x = x_ref[...].astype(jnp.bfloat16)
    one = jnp.bfloat16(1.0)
    zero = jnp.bfloat16(0.0)
    for b in range(8):
        for h in range(2):
            # Mosaic has no i16 shift; and+compare+select stays in the
            # (16, 128) tiling i16 and bf16 share.
            mask = jnp.uint16(1 << (8 * h + b))
            plane = jnp.where((u & mask) != 0, one, zero)
            acc_ref[b, h] += jnp.dot(plane, x,
                                     preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[0, :, 0] = acc_ref[...]


def _k2_kernel16(p_ref, g_ref, o_ref, acc_ref):
    """16-bit-lane backward (see ``_k1_kernel16``; rating folded into
    the contraction as in ``_k2_kernel``)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    u = pltpu.bitcast(p_ref[...], jnp.uint16)
    g = g_ref[0].astype(jnp.bfloat16)
    one = jnp.bfloat16(1.0)
    zero = jnp.bfloat16(0.0)
    for b in range(8):
        for h in range(2):
            mask = jnp.uint16(1 << (8 * h + b))
            plane = jnp.where((u & mask) != 0, one, zero)
            acc_ref[b, h] += jnp.dot(plane, g,
                                     preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[:, 0] = acc_ref[...]


def _k2_kernel(p_ref, g_ref, o_ref, acc_ref):
    """Backward: o[b, m, f] = sum_{r, s} bit_b(P[(r, m), s]) * g[s, r, f].

    Grid dim 1 enumerates (r, s-block); the accumulator is reset only at
    the first (r, s) step and flushed at the last, so the rating axis is
    folded into the contraction.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p32 = p_ref[...].astype(jnp.int32)
    g = g_ref[0].astype(jnp.bfloat16)
    for b in range(8):
        sb = _bit_plane(p32, b)
        acc_ref[b] += jnp.dot(sb, g, preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...]


try:  # Pallas is optional at import time (pure-XLA fallback below).
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False



def _fit_bm(bm: int, f: int, d8: int) -> int:
    """Shrink the row-block so the kernel's f32 accumulator (8, bm, f)
    plus its output block stay under scoped VMEM (~2 MB each): wide
    feature dims (mixed-precision widesweep, F > 512) overflow the
    16 MB scoped budget at the default bm=128."""
    while bm > 16 and (8 * bm * f * 4 > (2 << 20) or d8 % bm):
        bm //= 2
    return bm


def bit_expand_matmul(P, x, num_links, d8, *, bm=_BM, bs=_BS,
                      interpret=False):
    """``out[r, b, m, f] = sum_s bit_b(P[r*d8+m, s]) x[s, f]``.

    Args:
      P: ``(num_links * d8, S_pad)`` uint8.
      x: ``(S_pad, F)`` float (cast to bf16 inside; f32 accumulate).

    Returns ``(num_links, 8, d8, F)`` f32.
    """
    m8, s_pad = P.shape
    f = x.shape[1]
    bm = _fit_bm(bm, f, d8)
    n_m, n_s = m8 // bm, s_pad // bs
    grid = (n_m, n_s)
    nm_per_r = d8 // bm
    return pl.pallas_call(
        _k1_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bs), lambda i, j: (i, j)),
            pl.BlockSpec((bs, f), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, bm, f),
            lambda i, j: (i // nm_per_r, 0, i % nm_per_r, 0)),
        out_shape=jax.ShapeDtypeStruct((num_links, 8, d8, f), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, bm, f), jnp.float32)],
        interpret=interpret,
    )(P, x)


def bit_reduce_matmul(P, g, num_links, d8, *, bm=_BM, bs=_BS,
                      interpret=False):
    """``out[b, m, f] = sum_{r, s} bit_b(P[r*d8+m, s]) g[r, s, f]``.

    Args:
      P: ``(num_links * d8, S_pad)`` uint8.
      g: ``(num_links, S_pad, F)`` float cotangent table (rating-major so
        each grid step reads one contiguous (bs, F) slab).

    Returns ``(8, d8, F)`` f32.
    """
    m8, s_pad = P.shape
    f = g.shape[-1]
    bm = _fit_bm(bm, f, d8)
    n_m, n_s = d8 // bm, s_pad // bs
    grid = (n_m, num_links * n_s)
    return pl.pallas_call(
        _k2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bs),
                         lambda i, j: (j // n_s * n_m + i, j % n_s)),
            pl.BlockSpec((1, bs, f), lambda i, j: (j // n_s, j % n_s, 0)),
        ],
        out_specs=pl.BlockSpec((8, bm, f), lambda i, j: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((8, d8, f), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, bm, f), jnp.float32)],
        interpret=interpret,
    )(P, g)


def bit_expand_matmul16(P, x, num_links, d8, *, bm=_BM, bs=_BS,
                        interpret=False):
    """16-bit-lane variant of ``bit_expand_matmul``.  ``P`` must be
    packed with ``row_interleave=bm``; output is natural-order after
    the (free) reshape done here.  Returns ``(num_links, 8, d8, F)``."""
    m8, s_pad = P.shape
    f = x.shape[1]
    n_m, n_s = m8 // bm, s_pad // bs
    nm_per_r = d8 // bm
    out = pl.pallas_call(
        _k1_kernel16,
        grid=(n_m, n_s),
        in_specs=[
            pl.BlockSpec((bm, bs), lambda i, j: (i, j)),
            pl.BlockSpec((bs, f), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, 1, 2, bm // 2, f),
            lambda i, j: (i // nm_per_r, 0, i % nm_per_r, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (num_links, 8, nm_per_r, 2, bm // 2, f), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 2, bm // 2, f), jnp.float32)],
        interpret=interpret,
    )(P, x)
    return out.reshape(num_links, 8, d8, f)


def bit_reduce_matmul16(P, g, num_links, d8, *, bm=_BM, bs=_BS,
                        interpret=False):
    """16-bit-lane variant of ``bit_reduce_matmul`` (``P`` packed with
    ``row_interleave=bm``).  Returns ``(8, d8, F)``."""
    m8, s_pad = P.shape
    f = g.shape[-1]
    bm = _fit_bm(bm, f, d8)
    n_m, n_s = d8 // bm, s_pad // bs
    grid = (n_m, num_links * n_s)
    out = pl.pallas_call(
        _k2_kernel16,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bs),
                         lambda i, j: (j // n_s * n_m + i, j % n_s)),
            pl.BlockSpec((1, bs, f), lambda i, j: (j // n_s, j % n_s, 0)),
        ],
        out_specs=pl.BlockSpec((8, 1, 2, bm // 2, f),
                               lambda i, j: (0, i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, n_m, 2, bm // 2, f),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 2, bm // 2, f), jnp.float32)],
        interpret=interpret,
    )(P, g)
    return out.reshape(8, d8, f)


# ------------------------- XLA reference models -------------------------


def xla_expand_matmul(P, x, num_links, d8):
    """Pure-XLA golden model of ``bit_expand_matmul`` (also the CPU
    fallback): unpack all 8 planes and einsum."""
    m8, s_pad = P.shape
    planes = ((P[None] >> jnp.arange(8, dtype=P.dtype)[:, None, None]) & 1
              ).astype(x.dtype)                       # (8, M8, S)
    out = jnp.einsum("bms,sf->bmf", planes, x,
                     preferred_element_type=jnp.float32)
    return out.reshape(8, num_links, d8, -1).transpose(1, 0, 2, 3)


def xla_reduce_matmul(P, g, num_links, d8):
    """Pure-XLA golden model of ``bit_reduce_matmul`` (same ``(R, S, F)``
    rating-major cotangent convention)."""
    m8, s_pad = P.shape
    planes = ((P[None] >> jnp.arange(8, dtype=P.dtype)[:, None, None]) & 1
              ).astype(g.dtype)                       # (8, R*d8, S)
    planes = planes.reshape(8, num_links, d8, s_pad)
    return jnp.einsum("brms,rsf->bmf", planes, g,
                      preferred_element_type=jnp.float32)


# --------------------------- differentiable op ---------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def bit_pool_rated(x, p_fwd, p_bwd, num_links, d8_dst, d8_src, impl,
                   interpret):
    """Differentiable per-rating pooled aggregation over packed bits.

    Args:
      x: ``(S_pad, F)`` source features (padded rows must be zero-safe —
        they simply never have bits set).
      p_fwd: ``(num_links * d8_dst, S_pad)`` uint8 — this direction.
      p_bwd: ``(num_links * d8_src, D_pad)`` uint8 — transpose layout,
        used only by the backward pass.
      impl: 'pallas' | 'xla'.

    Returns ``(8 * d8_dst, num_links, F)`` f32 — index with the natural
    destination id ``d`` (``d = b * d8_dst + d8`` is the packing's own
    order).
    """
    return _bit_pool_fwd_impl(x, p_fwd, num_links, d8_dst, impl, interpret)


def _bit_pool_fwd_impl(x, p_fwd, num_links, d8, impl, interpret):
    if impl == "pallas16" and _HAVE_PALLAS:
        out = bit_expand_matmul16(p_fwd, x, num_links, d8,
                                  interpret=interpret)
    elif impl == "pallas" and _HAVE_PALLAS:
        out = bit_expand_matmul(p_fwd, x, num_links, d8,
                                interpret=interpret)
    elif impl == "pallas16":
        raise RuntimeError(
            "bit_impl='pallas16' needs Pallas (its packs are "
            "row-interleaved and unreadable by the XLA fallback)")
    else:
        out = xla_expand_matmul(p_fwd, x, num_links, d8)
    # (R, 8, d8, F) -> (8*d8, R, F), natural dst index.
    return out.transpose(1, 2, 0, 3).reshape(8 * d8, num_links, -1)


def _bit_pool_fwd(x, p_fwd, p_bwd, num_links, d8_dst, d8_src, impl,
                  interpret):
    out = _bit_pool_fwd_impl(x, p_fwd, num_links, d8_dst, impl, interpret)
    return out, (p_bwd,)


def _bit_pool_bwd(num_links, d8_dst, d8_src, impl, interpret, res, g):
    (p_bwd,) = res
    # g: (8*d8_dst, R, F) == (D_pad, R, F); K2 wants it rating-major.
    g_rm = g.transpose(1, 0, 2)
    if impl == "pallas16" and _HAVE_PALLAS:
        d_x = bit_reduce_matmul16(p_bwd, g_rm, num_links, d8_src,
                                  interpret=interpret)
    elif impl == "pallas" and _HAVE_PALLAS:
        d_x = bit_reduce_matmul(p_bwd, g_rm, num_links, d8_src,
                                interpret=interpret)
    elif impl == "pallas16":
        raise RuntimeError(
            "bit_impl='pallas16' needs Pallas (its packs are "
            "row-interleaved and unreadable by the XLA fallback)")
    else:
        d_x = xla_reduce_matmul(p_bwd, g_rm, num_links, d8_src)
    d_x = d_x.reshape(8 * d8_src, -1)
    return (d_x.astype(g.dtype), None, None)


bit_pool_rated.defvjp(_bit_pool_fwd, _bit_pool_bwd)


# ----------------------------- aggregator op -----------------------------


def bit_multi_link_aggregate(x, bit_static, weight, bias,
                             ordinal_sharing: bool, accum: str):
    """Full multi-link aggregation through a ``BitStatic`` operand pack.

    Identical contract to ``ops.chunked_ell.ell_multi_link_aggregate``
    (aggregate-then-project with the ones-column bias trick, separable
    degree scales, rank-B removed-edge correction) — only the pooling
    engine differs.
    """
    bs = bit_static
    num_src = x.shape[0]
    num_dst = bs.dst_scale.shape[0]
    R = weight.shape[0]
    s_pad = bs.p_fwd.shape[1]
    ones = jnp.ones((num_src, 1), x.dtype)
    x_aug = jnp.concatenate([x, ones], axis=1) * bs.src_scale[:, None]
    if s_pad > num_src:
        x_aug = jnp.pad(x_aug, ((0, s_pad - num_src), (0, 0)))
    pooled = bit_pool_rated(
        x_aug, bs.p_fwd, bs.p_bwd, R, bs.d8_dst, bs.d8_src,
        bs.impl, bs.interpret)[:num_dst].astype(x.dtype)
    if bs.rem_src is not None:
        gathered = jnp.take(x_aug, bs.rem_src, axis=0) \
            * bs.rem_weight[:, None]
        seg = bs.rem_dst * R + bs.rem_rating
        from stargcn_tpu.ops.gather import onehot_segment_sum
        corr = onehot_segment_sum(
            gathered, seg, num_dst * R).reshape(num_dst, R, -1)
        pooled = pooled - corr
    pooled = pooled * bs.dst_scale[:, None, None]

    w_aug = jnp.concatenate([weight, bias[:, None, :]], axis=1)
    if ordinal_sharing:
        w_aug = jnp.cumsum(w_aug, axis=0)
    out = jnp.einsum("drf,rfu->dru", pooled, w_aug,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    link_units = weight.shape[-1]
    if accum == "stack":
        return out.reshape(num_dst, R * link_units)
    if accum == "sum":
        return out.sum(axis=1)
    raise ValueError(f"unknown accum: {accum!r}")


# ------------------------------ numpy golden ------------------------------


def ref_bit_pool(x, P, num_links, d8):
    """Pure-numpy golden: unpack every bit and pool."""
    m8, s_pad = P.shape
    out = np.zeros((8 * d8, num_links, x.shape[1]), np.float32)
    for row in range(m8):
        r, m = row // d8, row % d8
        for s in range(s_pad):
            v = int(P[row, s])
            for b in range(8):
                if v & (1 << b):
                    out[b * d8 + m, r] += x[s]
    return out
