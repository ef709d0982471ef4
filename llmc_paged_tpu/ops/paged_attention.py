"""The Pallas paged-attention decode kernel (the north-star kernel).

One kernel performs what the reference does in three steps — gather the
block table (collect_kv_blocks, block_manager.c:165-201), walk pages with
pointer arithmetic (attention_paged, paged_infer.c:163-240), and a 4-pass
softmax — as a single flash-decode pass over non-contiguous KV pages:

  * grid (batch, pages_per_seq); the kernel's BlockSpec index_map reads the
    scalar-prefetched block table, so the Mosaic pipeline DMAs exactly the
    pages each sequence owns, double-buffered, straight from the HBM pool —
    there is NO materialised contiguous copy (the copy the reference itself
    flags as the thing to eliminate, cached_infer.c:663-665);
  * per grid step, ALL local heads process one page: a (NH,1,HS)×(NH,ps,HS)
    batched GEMV on the MXU + online-softmax state (running max m, sum l,
    accumulator acc) in VMEM scratch — the algorithm of the reference's
    online softmax_forward_kernel5 (train_gpt2.cu:208-263) applied over
    gathered pages;
  * per-token masking `page_start + slot < length` handles ragged sequence
    lengths and partially-filled tail pages.

Layouts match kv/layouts.py: pools are (NH, P, page_size, HS) per layer
(head-major → tensor-parallel sharding over heads needs no kernel change;
shard_map hands each shard its local heads).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llmc_paged_tpu.ops import layers as L

NEG_INF = -1e30


def _paged_decode_kernel(
    # scalar prefetch
    lengths_ref,      # (B,) int32 in SMEM
    starts_ref,       # (B,) int32 in SMEM — sliding-window lower bounds
    tables_ref,       # (B, pages_per_seq) int32 in SMEM (unused in body;
                      # consumed by the index maps)
    # blocks
    q_ref,            # (1, NH, HS)
    k_ref,            # (NH, 1, ps, HS)  — one page, all local heads
    v_ref,            # (NH, 1, ps, HS)
    out_ref,          # (1, NH, HS)
    # scratch
    m_ref,            # (NH, 1) f32
    l_ref,            # (NH, 1) f32
    acc_ref,          # (NH, HS) f32
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    num_pages_per_seq = pl.num_programs(1)
    ps = k_ref.shape[2]
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
        k = k_ref[:, 0].astype(jnp.float32)         # (NH, ps, HS)
        v = v_ref[:, 0].astype(jnp.float32)
        scale = jax.lax.rsqrt(jnp.float32(q.shape[-1]))
        # batched GEMV: scores[h, p] = q[h] · k[h, p]
        scores = jax.lax.dot_general(
            q[:, None, :], k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )[:, 0, :] * scale                          # (NH, ps)
        pos = i * ps + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where((pos < length) & (pos >= start), scores, NEG_INF)

        m_prev, l_prev = m_ref[...], l_ref[...]
        m_cur = jnp.max(scores, axis=1, keepdims=True)       # (NH, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(scores - m_new)                           # (NH, ps)
        alpha = jnp.exp(m_prev - m_new)                       # (NH, 1)
        l_ref[...] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p[:, None, :], v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )[:, 0, :]                                            # (NH, HS)
        m_ref[...] = m_new
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(i == num_pages_per_seq - 1)
    def _finalize():
        l = l_ref[...]
        l = jnp.where(l == 0.0, 1.0, l)   # length-0 rows → zeros, not NaN
        out_ref[0] = (acc_ref[...] / l).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_decode_attention(q: jax.Array, k_pages: jax.Array,
                           v_pages: jax.Array, block_tables: jax.Array,
                           lengths: jax.Array, starts: jax.Array | None = None,
                           interpret: bool = False) -> jax.Array:
    """Flash-decode over paged KV.

    q:            (B, NH, HS) — one query token per sequence
    k_pages/v_pages: (NH, P, page_size, HS) pool (one layer)
    block_tables: (B, pages_per_seq) int32 — page ids per sequence, in order
    lengths:      (B,) int32 — valid tokens per sequence (including the
                  current token, whose K/V must already be in the pool)
    starts:       (B,) int32 optional sliding-window lower bound (the
                  `offset` of attention_paged, paged_infer.c:165,190);
                  positions < start are masked and fully-below-start pages
                  are skipped
    returns       (B, NH, HS)
    """
    B, NH, HS = q.shape
    if starts is None:
        starts = jnp.zeros_like(lengths)
    _, P, ps, _ = k_pages.shape
    pages_per_seq = block_tables.shape[1]

    def q_map(b, i, lengths_ref, starts_ref, tables_ref):
        return (b, 0, 0)

    def kv_map(b, i, lengths_ref, starts_ref, tables_ref):
        return (0, tables_ref[b, i], 0, 0)

    def out_map(b, i, lengths_ref, starts_ref, tables_ref):
        return (b, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, pages_per_seq),
        in_specs=[
            pl.BlockSpec((1, NH, HS), q_map),
            pl.BlockSpec((NH, 1, ps, HS), kv_map),
            pl.BlockSpec((NH, 1, ps, HS), kv_map),
        ],
        out_specs=pl.BlockSpec((1, NH, HS), out_map),
        scratch_shapes=[
            pltpu.VMEM((NH, 1), jnp.float32),
            pltpu.VMEM((NH, 1), jnp.float32),
            pltpu.VMEM((NH, HS), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _paged_decode_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, NH, HS), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * NH * pages_per_seq * ps * HS,
            bytes_accessed=(2 * B * NH * pages_per_seq * ps * HS + B * NH * HS)
            * jnp.dtype(q.dtype).itemsize,
            transcendentals=B * NH * pages_per_seq * ps,
        ),
    )(lengths, starts, block_tables, q, k_pages, v_pages)


def _paged_decode_quant_kernel(
    lengths_ref, starts_ref, tables_ref,
    q_ref,            # (1, NH, HS)
    k_ref,            # (NH, 1, ps, HS) int8
    v_ref,
    ks_ref,           # (NH, 1, 1, ps) f32 — per-row scales
    vs_ref,
    out_ref,
    m_ref, l_ref, acc_ref,
):
    """INT8-KV variant: identical flash-decode loop with the dequant fused
    into the page load (k = k_q * scale), so pages move HBM→VMEM at 1/4 the
    fp32 bytes (north-star INT8 KV pages)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    num_pages_per_seq = pl.num_programs(1)
    ps = k_ref.shape[2]
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
        ks = ks_ref[:, 0, 0, :]                       # (NH, ps)
        vs = vs_ref[:, 0, 0, :]
        k = k_ref[:, 0].astype(jnp.float32) * ks[..., None]
        v = v_ref[:, 0].astype(jnp.float32) * vs[..., None]
        scale = jax.lax.rsqrt(jnp.float32(q.shape[-1]))
        scores = jax.lax.dot_general(
            q[:, None, :], k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
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
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
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
def paged_decode_attention_quant(q: jax.Array, k_pages: jax.Array,
                                 v_pages: jax.Array, k_scale: jax.Array,
                                 v_scale: jax.Array, block_tables: jax.Array,
                                 lengths: jax.Array,
                                 starts: jax.Array | None = None,
                                 interpret: bool = False) -> jax.Array:
    """Flash-decode over INT8 KV pages. k_pages/v_pages: int8
    (NH, P, ps, HS); k_scale/v_scale: (NH, P, 1, ps) f32."""
    B, NH, HS = q.shape
    _, P, ps, _ = k_pages.shape
    pages_per_seq = block_tables.shape[1]
    if starts is None:
        starts = jnp.zeros_like(lengths)

    def q_map(b, i, lengths_ref, starts_ref, tables_ref):
        return (b, 0, 0)

    def kv_map(b, i, lengths_ref, starts_ref, tables_ref):
        return (0, tables_ref[b, i], 0, 0)

    def out_map(b, i, lengths_ref, starts_ref, tables_ref):
        return (b, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, pages_per_seq),
        in_specs=[
            pl.BlockSpec((1, NH, HS), q_map),
            pl.BlockSpec((NH, 1, ps, HS), kv_map),
            pl.BlockSpec((NH, 1, ps, HS), kv_map),
            pl.BlockSpec((NH, 1, 1, ps), kv_map),
            pl.BlockSpec((NH, 1, 1, ps), kv_map),
        ],
        out_specs=pl.BlockSpec((1, NH, HS), out_map),
        scratch_shapes=[
            pltpu.VMEM((NH, 1), jnp.float32),
            pltpu.VMEM((NH, 1), jnp.float32),
            pltpu.VMEM((NH, HS), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _paged_decode_quant_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, NH, HS), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * NH * pages_per_seq * ps * HS,
            bytes_accessed=2 * B * NH * pages_per_seq * ps * (HS + 4)
            + B * NH * HS * 4,
            transcendentals=B * NH * pages_per_seq * ps,
        ),
    )(lengths, starts, block_tables, q, k_pages, v_pages, k_scale, v_scale)


def _paged_decode_full_kernel(
    # scalar prefetch
    layer_ref,        # (1,) int32 — which layer's pool plane to read
    lengths_ref, starts_ref, tables_ref,
    # blocks
    q_ref,            # (1, NH, HS)
    k_ref,            # (1, NH, 1, ps, HS) — one page of one layer
    v_ref,
    out_ref,
    m_ref, l_ref, acc_ref,
):
    """Full-pool variant of _paged_decode_kernel: identical flash-decode
    loop, but the K/V operands are the WHOLE (L, NH, P, ps, HS) pool and the
    layer is selected by the BlockSpec index map from a prefetched scalar.
    This lets the layer scan keep the pool as a carry (in-place dynamic
    updates) instead of streaming per-layer slices through scan xs/ys —
    which would copy the entire pool every decode step."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    num_pages_per_seq = pl.num_programs(1)
    ps = k_ref.shape[3]
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
        k = k_ref[0, :, 0].astype(jnp.float32)      # (NH, ps, HS)
        v = v_ref[0, :, 0].astype(jnp.float32)
        scale = jax.lax.rsqrt(jnp.float32(q.shape[-1]))
        scores = jax.lax.dot_general(
            q[:, None, :], k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
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
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
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
    """Flash-decode over ONE layer of the full (L, NH, P, ps, HS) pool,
    selected by the traced scalar ``layer`` — no per-layer pool slice is
    materialised (the slice would be a multi-MB copy per layer per step)."""
    B, NH, HS = q.shape
    L, _, P, ps, _ = k_pool.shape
    pages_per_seq = block_tables.shape[1]
    if starts is None:
        starts = jnp.zeros_like(lengths)

    def q_map(b, i, layer_ref, lengths_ref, starts_ref, tables_ref):
        return (b, 0, 0)

    def kv_map(b, i, layer_ref, lengths_ref, starts_ref, tables_ref):
        return (layer_ref[0], 0, tables_ref[b, i], 0, 0)

    def out_map(b, i, layer_ref, lengths_ref, starts_ref, tables_ref):
        return (b, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, pages_per_seq),
        in_specs=[
            pl.BlockSpec((1, NH, HS), q_map),
            pl.BlockSpec((1, NH, 1, ps, HS), kv_map),
            pl.BlockSpec((1, NH, 1, ps, HS), kv_map),
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
    k_ref,            # (1, NH, 1, ps, HS) int8
    v_ref,
    ks_ref,           # (1, NH, 1, 1, ps) f32
    vs_ref,
    out_ref,
    m_ref, l_ref, acc_ref,
):
    """Full-pool INT8-KV variant (dequant fused into the page load)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    num_pages_per_seq = pl.num_programs(1)
    ps = k_ref.shape[3]
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
        ks = ks_ref[0, :, 0, 0, :]                    # (NH, ps)
        vs = vs_ref[0, :, 0, 0, :]
        k = k_ref[0, :, 0].astype(jnp.float32) * ks[..., None]
        v = v_ref[0, :, 0].astype(jnp.float32) * vs[..., None]
        scale = jax.lax.rsqrt(jnp.float32(q.shape[-1]))
        scores = jax.lax.dot_general(
            q[:, None, :], k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
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
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
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
    """Full-pool flash-decode over INT8 KV: pools (L, NH, P, ps, HS) int8,
    scales (L, NH, P, 1, ps) f32, layer selected by scalar prefetch."""
    B, NH, HS = q.shape
    L, _, P, ps, _ = k_pool.shape
    pages_per_seq = block_tables.shape[1]
    if starts is None:
        starts = jnp.zeros_like(lengths)

    def q_map(b, i, layer_ref, lengths_ref, starts_ref, tables_ref):
        return (b, 0, 0)

    def kv_map(b, i, layer_ref, lengths_ref, starts_ref, tables_ref):
        return (layer_ref[0], 0, tables_ref[b, i], 0, 0)

    def sc_map(b, i, layer_ref, lengths_ref, starts_ref, tables_ref):
        return (layer_ref[0], 0, tables_ref[b, i], 0, 0)

    def out_map(b, i, layer_ref, lengths_ref, starts_ref, tables_ref):
        return (b, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, pages_per_seq),
        in_specs=[
            pl.BlockSpec((1, NH, HS), q_map),
            pl.BlockSpec((1, NH, 1, ps, HS), kv_map),
            pl.BlockSpec((1, NH, 1, ps, HS), kv_map),
            pl.BlockSpec((1, NH, 1, 1, ps), sc_map),
            pl.BlockSpec((1, NH, 1, 1, ps), sc_map),
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


def paged_decode_attention_full_xla(q, k_pool, v_pool, layer, block_tables,
                                    lengths, starts=None):
    """Oracle/fallback for the full-pool float kernel: dynamic-slice the
    layer plane then run the gather path."""
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


def paged_decode_attention_quant_xla(q, k_pages, v_pages, k_scale, v_scale,
                                     block_tables, lengths, starts=None):
    """Oracle: dequantize the whole pool then run the float gather path."""
    from llmc_paged_tpu.kv.layouts import dequant_layer

    return paged_decode_attention_xla(
        q, dequant_layer(k_pages, k_scale), dequant_layer(v_pages, v_scale),
        block_tables, lengths, starts)


def paged_decode_attention_xla(q: jax.Array, k_pages: jax.Array,
                               v_pages: jax.Array, block_tables: jax.Array,
                               lengths: jax.Array,
                               starts: jax.Array | None = None) -> jax.Array:
    """XLA oracle/fallback: materialise the gathered KV then run masked
    attention (the fill_from_kv_cache-style copy the kernel eliminates).
    Used for equivalence tests (test_paged_attn.c pattern) and on backends
    without Mosaic."""
    from llmc_paged_tpu.kv.layouts import gather_layer_kv

    k, v = gather_layer_kv(k_pages, v_pages, block_tables)
    return L.decode_attention(q, k, v, lengths, start=starts)
