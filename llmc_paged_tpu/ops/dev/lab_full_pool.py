"""LAB ARTIFACTS: the stacked-pool ("full-pool") kernel family.

Design record for the round-1 layout decision (docs/DESIGN.md): keep the
KV pool as ONE stacked (L, P, NH, HS, ps) array carried through a
`lax.scan` over layers, with the layer plane selected inside the Pallas
kernel by a scalar-prefetched index map. Measured 1.7-6x SLOWER than the
production per-layer buffer tuples + unrolled layer loop (XLA copies the
scan-carried pool on every in-place update; probe_decode.py records the
numbers), so none of this is on a serving path — it lives here, next to
the other kernel-lab benches, as the documented alternative.

Production counterparts: ops/paged_attention.py (serving kernels over
per-layer (P, NH, HS, ps) buffers), kv/layouts.py (write_layer_kv).
Reference semantics these mirror: attention_paged walking block tables
(paged_infer.c:163-240) over the stacked cache of cached_infer.c.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llmc_paged_tpu.kv.layouts import (PagePool, QuantPagePool,
                                       quantize_rows)
from llmc_paged_tpu.ops.paged_attention import (
    NEG_INF, paged_decode_attention_quant_xla, paged_decode_attention_xla)


# ------------------------- stacked-pool writes --------------------------

def write_kv_full(pool: PagePool, layer: jax.Array, k_new: jax.Array,
                  v_new: jax.Array, page: jax.Array,
                  slot: jax.Array) -> PagePool:
    """Scatter (N, NH, HS) rows into layer ``layer`` of a STACKED
    (L, P, NH, HS, ps) pool (a PagePool whose k/v are single stacked
    arrays, not the production per-layer tuples). Invalid tokens use
    page == P and are dropped (the token_coords convention)."""
    k = pool.k.at[layer, page, :, :, slot].set(
        k_new.astype(pool.k.dtype), mode="drop")
    v = pool.v.at[layer, page, :, :, slot].set(
        v_new.astype(pool.v.dtype), mode="drop")
    return PagePool(k, v)


def write_kv_quant_full(pool: QuantPagePool, layer: jax.Array,
                        k_new: jax.Array, v_new: jax.Array,
                        page: jax.Array, slot: jax.Array) -> QuantPagePool:
    """write_kv_full for int8 pools (stacked (L, P, NH, HS, ps) int8 +
    (L, P, NH, ps) f32 scales)."""
    kq, ks = quantize_rows(k_new)   # (N, NH, HS) int8, (N, NH) f32
    vq, vs = quantize_rows(v_new)
    k = pool.k.at[layer, page, :, :, slot].set(kq, mode="drop")
    v = pool.v.at[layer, page, :, :, slot].set(vq, mode="drop")
    k_scale = pool.k_scale.at[layer, page, :, slot].set(ks, mode="drop")
    v_scale = pool.v_scale.at[layer, page, :, slot].set(vs, mode="drop")
    return QuantPagePool(k, v, k_scale, v_scale)


# ------------------------ stacked-pool kernels --------------------------

def _paged_decode_full_kernel(
    # scalar prefetch
    layer_ref,        # (1,) int32 — which layer's pool plane to read
    lengths_ref, starts_ref, tables_ref,
    # blocks
    q_ref,            # (1, NH, HS)
    k_ref,            # (1, 1, NH, HS, ps) — one page of one layer
    v_ref,
    out_ref,
    m_ref, l_ref, acc_ref,
):
    """Stacked-pool variant of the grid flash-decode kernel: identical
    online-softmax loop, but the K/V operands are the WHOLE
    (L, P, NH, HS, ps) pool and the layer is selected by the BlockSpec
    index map from a prefetched scalar. This lets a layer scan keep the
    pool as a carry (in-place dynamic updates) instead of streaming
    per-layer slices through scan xs/ys — which would copy the entire
    pool every decode step."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    num_pages_per_seq = pl.num_programs(1)
    ps = k_ref.shape[4]
    length = lengths_ref[b]
    start = starts_ref[b]

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when((i * ps < length) & ((i + 1) * ps > start))
    def _update():
        q = q_ref[0].astype(jnp.float32)            # (NH, HS)
        k = k_ref[0, 0].astype(jnp.float32)         # (NH, HS, ps)
        v = v_ref[0, 0].astype(jnp.float32)
        scale = jax.lax.rsqrt(jnp.float32(q.shape[-1]))
        scores = jax.lax.dot_general(
            q[:, None, :], k,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )[:, 0, :] * scale                          # (NH, ps)
        pos = i * ps + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where((pos < length) & (pos >= start), scores, NEG_INF)
        m_prev, l_prev = m_ref[...], l_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[...] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p[:, None, :], v,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )[:, 0, :]
        m_ref[...] = m_new
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(i == num_pages_per_seq - 1)
    def _finalize():
        l = l_ref[...]
        l = jnp.where(l == 0.0, 1.0, l)
        out_ref[0] = (acc_ref[...] / l).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_decode_attention_full(q: jax.Array, k_pool: jax.Array,
                                v_pool: jax.Array, layer: jax.Array,
                                block_tables: jax.Array, lengths: jax.Array,
                                starts: jax.Array | None = None,
                                interpret: bool = False) -> jax.Array:
    """Flash-decode over ONE layer of the full (L, P, NH, HS, ps) pool,
    selected by the traced scalar ``layer`` — no per-layer pool slice is
    materialised (the slice would be a multi-MB copy per layer per step)."""
    B, NH, HS = q.shape
    L, P, _, _, ps = k_pool.shape
    pages_per_seq = block_tables.shape[1]
    if starts is None:
        starts = jnp.zeros_like(lengths)

    def q_map(b, i, layer_ref, lengths_ref, starts_ref, tables_ref):
        return (b, 0, 0)

    def kv_map(b, i, layer_ref, lengths_ref, starts_ref, tables_ref):
        return (layer_ref[0], tables_ref[b, i], 0, 0, 0)

    def out_map(b, i, layer_ref, lengths_ref, starts_ref, tables_ref):
        return (b, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, pages_per_seq),
        in_specs=[
            pl.BlockSpec((1, NH, HS), q_map),
            pl.BlockSpec((1, 1, NH, HS, ps), kv_map),
            pl.BlockSpec((1, 1, NH, HS, ps), kv_map),
        ],
        out_specs=pl.BlockSpec((1, NH, HS), out_map),
        scratch_shapes=[
            pltpu.VMEM((NH, 1), jnp.float32),
            pltpu.VMEM((NH, 1), jnp.float32),
            pltpu.VMEM((NH, HS), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _paged_decode_full_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, NH, HS), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * NH * pages_per_seq * ps * HS,
            bytes_accessed=(2 * B * NH * pages_per_seq * ps * HS + B * NH * HS)
            * jnp.dtype(k_pool.dtype).itemsize,
            transcendentals=B * NH * pages_per_seq * ps,
        ),
    )(layer.reshape(1).astype(jnp.int32), lengths, starts, block_tables,
      q, k_pool, v_pool)


def _paged_decode_quant_full_kernel(
    layer_ref, lengths_ref, starts_ref, tables_ref,
    q_ref,            # (1, NH, HS)
    k_ref,            # (1, 1, NH, HS, ps) int8
    v_ref,
    ks_ref,           # (1, 1, NH, ps) f32
    vs_ref,
    out_ref,
    m_ref, l_ref, acc_ref,
):
    """Stacked-pool INT8-KV variant (dequant fused into the page load)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    num_pages_per_seq = pl.num_programs(1)
    ps = k_ref.shape[4]
    length = lengths_ref[b]
    start = starts_ref[b]

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when((i * ps < length) & ((i + 1) * ps > start))
    def _update():
        q = q_ref[0].astype(jnp.float32)
        ks = ks_ref[0, 0]                             # (NH, ps)
        vs = vs_ref[0, 0]
        k = k_ref[0, 0].astype(jnp.float32) * ks[:, None, :]
        v = v_ref[0, 0].astype(jnp.float32) * vs[:, None, :]
        scale = jax.lax.rsqrt(jnp.float32(q.shape[-1]))
        scores = jax.lax.dot_general(
            q[:, None, :], k,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )[:, 0, :] * scale
        pos = i * ps + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where((pos < length) & (pos >= start), scores, NEG_INF)
        m_prev, l_prev = m_ref[...], l_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[...] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p[:, None, :], v,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )[:, 0, :]
        m_ref[...] = m_new
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(i == num_pages_per_seq - 1)
    def _finalize():
        l = l_ref[...]
        l = jnp.where(l == 0.0, 1.0, l)
        out_ref[0] = (acc_ref[...] / l).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_decode_attention_quant_full(q: jax.Array, k_pool: jax.Array,
                                      v_pool: jax.Array, k_scale: jax.Array,
                                      v_scale: jax.Array, layer: jax.Array,
                                      block_tables: jax.Array,
                                      lengths: jax.Array,
                                      starts: jax.Array | None = None,
                                      interpret: bool = False) -> jax.Array:
    """Stacked-pool flash-decode over INT8 KV: pools (L, P, NH, HS, ps)
    int8, scales (L, P, NH, ps) f32, layer selected by scalar prefetch."""
    B, NH, HS = q.shape
    L, P, _, _, ps = k_pool.shape
    pages_per_seq = block_tables.shape[1]
    if starts is None:
        starts = jnp.zeros_like(lengths)

    def q_map(b, i, layer_ref, lengths_ref, starts_ref, tables_ref):
        return (b, 0, 0)

    def kv_map(b, i, layer_ref, lengths_ref, starts_ref, tables_ref):
        return (layer_ref[0], tables_ref[b, i], 0, 0, 0)

    def sc_map(b, i, layer_ref, lengths_ref, starts_ref, tables_ref):
        return (layer_ref[0], tables_ref[b, i], 0, 0)

    def out_map(b, i, layer_ref, lengths_ref, starts_ref, tables_ref):
        return (b, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, pages_per_seq),
        in_specs=[
            pl.BlockSpec((1, NH, HS), q_map),
            pl.BlockSpec((1, 1, NH, HS, ps), kv_map),
            pl.BlockSpec((1, 1, NH, HS, ps), kv_map),
            pl.BlockSpec((1, 1, NH, ps), sc_map),
            pl.BlockSpec((1, 1, NH, ps), sc_map),
        ],
        out_specs=pl.BlockSpec((1, NH, HS), out_map),
        scratch_shapes=[
            pltpu.VMEM((NH, 1), jnp.float32),
            pltpu.VMEM((NH, 1), jnp.float32),
            pltpu.VMEM((NH, HS), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _paged_decode_quant_full_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, NH, HS), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * NH * pages_per_seq * ps * HS,
            bytes_accessed=2 * B * NH * pages_per_seq * ps * (HS + 4)
            + B * NH * HS * 4,
            transcendentals=B * NH * pages_per_seq * ps,
        ),
    )(layer.reshape(1).astype(jnp.int32), lengths, starts, block_tables,
      q, k_pool, v_pool, k_scale, v_scale)


# ------------------------------ oracles ---------------------------------

def paged_decode_attention_full_xla(q, k_pool, v_pool, layer, block_tables,
                                    lengths, starts=None):
    """Oracle/fallback for the stacked-pool float kernel: dynamic-slice
    the layer plane then run the gather path."""
    k_l = jax.lax.dynamic_index_in_dim(k_pool, layer, 0, keepdims=False)
    v_l = jax.lax.dynamic_index_in_dim(v_pool, layer, 0, keepdims=False)
    return paged_decode_attention_xla(q, k_l, v_l, block_tables, lengths,
                                      starts)


def paged_decode_attention_quant_full_xla(q, k_pool, v_pool, k_scale,
                                          v_scale, layer, block_tables,
                                          lengths, starts=None):
    sl = functools.partial(jax.lax.dynamic_index_in_dim, index=layer,
                           axis=0, keepdims=False)
    return paged_decode_attention_quant_xla(
        q, sl(k_pool), sl(v_pool), sl(k_scale), sl(v_scale), block_tables,
        lengths, starts)
