"""LAB ARTIFACT: the "flatwide" paged-attention experiment (round 4).

Hypothesis: the flat ring kernel's per-page structure (fori_loop
iteration, two semaphore waits, two small batched GEMVs whose NH batch
dim Mosaic unrolls into NH sequential MXU ops) dominated the measured
~46us/layer-call at 1.5B int8 decode shapes. This kernel removed the
per-page loop entirely: every live page of the batch DMA'd into ONE wide
VMEM buffer at a static lane slot (b*pages_per_seq + j)*ps, whole-batch
attention as two large masked dots + one masked softmax (no online
accumulation), cross-sequence columns masked.

MEASURED ON CHIP (2026-08-19, TPU v5 lite, GPT-2 1.5B shapes NH=25
HS=64 B=8 pages/seq=3 ps=128, docs/tpu_evidence_20260819_010423.log):

    flat ring  int8 live=2:   46.6 us/layer-call
    flatwide   int8 live=2: 1981.5 us/layer-call   (40x WORSE)
    flatwide   f32: failed to compile — 37.5MB scoped-VMEM stack vs the
    16MB limit (the f32 casts of both wide buffers live on the stack)

and the same window's f32 flat-ring row ran at 801 GB/s — streaming
rate — which killed the hypothesis itself: the ring's per-page overhead
is already negligible; the int8 kernel's cost is the per-element dequant
work (fixed separately by post-dot scale folding in the serving module).
Kept compilable + oracle-equivalent in interpret mode as the design
record (the dev/cuda pattern: measured dead ends stay in the lab).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llmc_paged_tpu.ops.paged_attention import NEG_INF

# lane width cap: 4096 lanes x NH x HS f32 dequant copies must fit VMEM
# comfortably at 1.5B shapes (25 heads: ~2x26MB + scores ~2x3.3MB)
_FLATWIDE_LANE_LIMIT = 4096


def _flatwide_ok(B: int, pages_per_seq: int, ps: int, NH: int, HS: int,
                 quant: bool) -> bool:
    """Shape/VMEM gate the serving dispatch used while this was live."""
    if ps % 128 != 0:
        return False
    Lw = B * pages_per_seq * ps
    if Lw > _FLATWIDE_LANE_LIMIT:
        return False
    # src buffers + f32 dequant copies + scores/p planes (+ wide scales)
    item = 1 if quant else 4
    need = 2 * NH * HS * Lw * item + 2 * NH * HS * Lw * 4 \
        + 2 * NH * B * Lw * 4 + (2 * NH * Lw * 4 if quant else 0)
    return need <= 96 * 1024 * 1024


def _make_flash_decode_flatwide_kernel(B: int, W: int, quant: bool):
    """Build the flatwide kernel (see the section comment above). W is
    the block-table width (pages_per_seq); lane slot (b*W + j) holds row
    b's j-th LIVE page (ordinal from the live range's first page), so
    ownership and positions are static functions of the lane index. Slots
    whose page was never DMA'd hold stale data that the position mask
    discards (their positions are >= the row's length by construction)."""

    def kernel(lengths_ref, starts_ref, tables_ref, q_ref, k_hbm, v_hbm,
               *rest):
        if quant:
            (ksc_ref, vsc_ref, out_ref, m_out, l_out, kbuf, vbuf,
             kscw, vscw, sems) = rest
        else:
            out_ref, m_out, l_out, kbuf, vbuf, sems = rest
        NH, HS, Lw = kbuf.shape
        P = k_hbm.shape[0]
        ps = Lw // (B * W)
        firsts = [starts_ref[b] // ps for b in range(B)]

        # EVERY slot is DMA'd — slots past a row's live range re-fetch a
        # clamped (valid) table entry. The duplicate bytes are masked by
        # position; the point is that every buffer lane is written every
        # call, so no dot ever touches uninitialized VMEM (stale bits can
        # be NaN/Inf payloads, and 0 * NaN = NaN would leak through the
        # masked PV contraction). It also keeps the issue/wait sequences
        # branch-free.
        def page_of(b, j):
            idx = jnp.clip(firsts[b] + j, 0, tables_ref.shape[1] - 1)
            return jnp.clip(tables_ref[b, idx], 0, P - 1)

        def kdma(b, j):
            off = (b * W + j) * ps               # static lane offset
            return pltpu.make_async_copy(
                k_hbm.at[page_of(b, j)], kbuf.at[:, :, pl.ds(off, ps)],
                sems.at[0])

        def vdma(b, j):
            off = (b * W + j) * ps
            return pltpu.make_async_copy(
                v_hbm.at[page_of(b, j)], vbuf.at[:, :, pl.ds(off, ps)],
                sems.at[1])

        # issue every slot's DMA up front (the DMA engines queue them);
        # scale rows are VMEM->VMEM vector copies, done inline
        for b in range(B):
            for j in range(W):
                kdma(b, j).start()
                vdma(b, j).start()
                if quant:
                    off = (b * W + j) * ps
                    page = page_of(b, j)
                    kscw[:, off:off + ps] = ksc_ref[page]
                    vscw[:, off:off + ps] = vsc_ref[page]

        # wait for all of them (DMA semaphores count: each wait consumes
        # exactly one same-shaped copy's signal, order irrelevant)
        for b in range(B):
            for j in range(W):
                kdma(b, j).wait()
                vdma(b, j).wait()

        kf = kbuf[...].astype(jnp.float32)
        vf = vbuf[...].astype(jnp.float32)
        q = q_ref[...].astype(jnp.float32).swapaxes(0, 1)   # (NH, B, HS)
        scale = jax.lax.rsqrt(jnp.float32(HS))
        scores = jax.lax.dot_general(
            q, kf, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST) * scale    # (NH, B, Lw)
        if quant:
            # post-dot scale folding (see the gridb kernel comment)
            scores = scores * kscw[...][:, None, :]

        col = jax.lax.broadcasted_iota(jnp.int32, (B, Lw), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (B, Lw), 0)
        local = col - row * (W * ps)        # lane offset within own slots
        firsts_v = jnp.stack(firsts)
        lengths_v = jnp.stack([lengths_ref[b] for b in range(B)])
        starts_v = jnp.stack([starts_ref[b] for b in range(B)])
        pos = firsts_v[:, None] * ps + local
        valid = (col // (W * ps) == row) \
            & (pos >= starts_v[:, None]) & (pos < lengths_v[:, None])
        scores = jnp.where(valid[None], scores, NEG_INF)
        m = jnp.max(scores, axis=2)                         # (NH, B)
        # masked rows: scores - m = NEG_INF - NEG_INF = nan; the where
        # keeps the parts contract (p = 0, l = 0, m = NEG_INF)
        p = jnp.where(valid[None], jnp.exp(scores - m[..., None]), 0.0)
        l = jnp.sum(p, axis=2)
        if quant:
            p = p * vscw[...][:, None, :]
        acc = jax.lax.dot_general(
            p, vf, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)            # (NH, B, HS)
        out_ref[...] = acc.swapaxes(0, 1).astype(out_ref.dtype)
        m_out[...] = m.swapaxes(0, 1)[..., None]
        l_out[...] = l.swapaxes(0, 1)[..., None]

    return kernel


def _flatwide_parts_call(q, k_pages, v_pages, block_tables, lengths, starts,
                         scales, interpret: bool):
    """pallas_call wrapper for the flatwide kernels (parts contract)."""
    B, NH, HS = q.shape
    P, _, _, ps = k_pages.shape
    W = block_tables.shape[1]
    Lw = B * W * ps
    quant = scales is not None
    in_specs = [
        pl.BlockSpec((B, NH, HS), lambda i, *_: (0, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    operands = [q, k_pages, v_pages]
    if quant:
        in_specs += [pl.BlockSpec((P, NH, ps), lambda i, *_: (0, 0, 0)),
                     pl.BlockSpec((P, NH, ps), lambda i, *_: (0, 0, 0))]
        operands += list(scales)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((B, NH, HS), lambda i, *_: (0, 0, 0)),
            pl.BlockSpec((B, NH, 1), lambda i, *_: (0, 0, 0)),
            pl.BlockSpec((B, NH, 1), lambda i, *_: (0, 0, 0)),
        ],
        scratch_shapes=(
            [pltpu.VMEM((NH, HS, Lw), k_pages.dtype),
             pltpu.VMEM((NH, HS, Lw), v_pages.dtype)]
            + ([pltpu.VMEM((NH, Lw), jnp.float32),
                pltpu.VMEM((NH, Lw), jnp.float32)] if quant else [])
            + [pltpu.SemaphoreType.DMA((2,))]
        ),
    )
    kv_bytes = 2 * B * NH * W * ps * HS * jnp.dtype(k_pages.dtype).itemsize
    if quant:
        kv_bytes += 2 * P * NH * ps * 4   # whole scale arrays ride to VMEM
    acc, m, l = pl.pallas_call(
        _make_flash_decode_flatwide_kernel(B, W, quant),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, NH, HS), jnp.float32),
                   jax.ShapeDtypeStruct((B, NH, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, NH, 1), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * NH * B * W * ps * HS,   # includes masked columns
            bytes_accessed=kv_bytes + B * NH * HS * 4,
            transcendentals=B * NH * B * W * ps,
        ),
    )(lengths, starts, block_tables, *operands)
    return acc, m[..., 0], l[..., 0]
