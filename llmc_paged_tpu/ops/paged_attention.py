"""The Pallas paged-attention decode kernels (the north-star kernels).

One kernel performs what the reference does in three steps — gather the
block table (collect_kv_blocks, block_manager.c:165-201), walk pages with
pointer arithmetic (attention_paged, paged_infer.c:163-240), and a 4-pass
softmax — as a single flash-decode pass over non-contiguous KV pages.

GRIDB serving kernels (_make_flash_decode_gridb_kernel): grid (B,);
each program walks only
its sequence's LIVE page range [start//ps, (length-1)//ps] with manual
double-buffered pltpu.make_async_copy from the HBM pool (no materialised
contiguous copy — the copy the reference itself flags as the thing to
eliminate, cached_infer.c:663-665 — and no dead-page fetches). Per page,
all local heads run (NH,1,HS)x(NH,HS,ps) MXU GEMVs with online-softmax
state (running max m, sum l, accumulator acc — the algorithm of the
reference's softmax_forward_kernel5, train_gpt2.cu:208-263) carried in
registers. They emit UNNORMALIZED (acc, m, l) so the decode chunk can
merge the pool prefix with its in-flight tail exactly; normalized
wrappers divide by l. Requires page_size % 128 == 0 (Mosaic DMA lane
alignment — GPT-2's HS=64 cannot be a lane dim, hence the transposed
(P, NH, HS, ps) pool layout in kv/layouts.py).

LAB variants (_grid suffix): the original grid-(B, pages_per_seq)
pipelined kernels — one page per grid step via scalar-prefetched
index maps. Measured ~10x off streaming rate at 1.5B (fixed per-grid-step
overhead on ~200KB payloads + all-table-entry fetches); kept as the
measured design record and as the ps<128 fallback of the NORMALIZED
wrappers (paged_decode_attention[_quant]). The PARTS entry points —
what serving's chunk path uses — fall back to the XLA gather oracle for
ps % 128 != 0 instead: correctness configs (page_size=32 reference
parity) pay the gather copy there, so serving page sizes should stay
multiples of 128.

Tensor parallelism shards heads (pool axis 1); shard_map hands each shard
its local heads and every kernel runs unchanged.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llmc_paged_tpu.ops import layers as L

NEG_INF = -1e30

# Serving kernel variant (dev toggle, read at trace time):
#   "flat"  — ONE Mosaic program per layer: static-unrolled batch loop over
#             a single globally double-buffered DMA stream (default; kills
#             the per-sequence program-launch overhead and the pipeline
#             drain at sequence boundaries of the (B,)-grid kernel)
#   "gridb" — the round-2 (B,)-grid kernel (one program per sequence)
# (a fourth variant, "flatwide" — every live page DMA'd into one wide
# lane buffer, whole-batch attention as two large masked dots — measured
# 40x SLOWER compiled (1981us/layer-call at 1.5B int8 vs flat's 46.6)
# and VMEM-stack-OOM at f32; it lives in ops/dev/lab_flatwide.py as the
# design record)
def _variant() -> str:
    """Serving kernel variant, read at TRACE time. jit caches are keyed
    on avals/statics only — the env var is NOT part of the key — so
    flipping it affects already-traced same-shape call sites only after
    `jax.clear_caches()`. Callers that flip mid-process (bench fallback,
    probe sweeps, tests) must clear; fresh processes just set the env."""
    return os.environ.get("LLMC_ATTN_VARIANT", "flat")

# The flat kernel's SMEM schedule scratch holds B*pages_per_seq int32
# entries; Mosaic SMEM allocation is limited, and exceeding it fails at
# COMPILE time (first request after deployment). Past this limit the
# dispatchers keep the (B,)-grid kernel / XLA-mq paths, which need no
# schedule. 4096 entries = 16KB — conservative for Mosaic SMEM.
_FLAT_SMEM_SCHED_LIMIT = 4096


def _flat_ok(B: int, pages_per_seq: int) -> bool:
    return (_variant() == "flat"
            and B * pages_per_seq <= _FLAT_SMEM_SCHED_LIMIT)


def _scale_dma():
    """Per-page scale-DMA stream for the int8 kernels. Tri-state
    (LLMC_ATTN_SCALE_DMA): unset/"auto" -> None (AUTO: used when the
    pinned-scales layout would blow the scoped-vmem budget — the r5
    default, hardware-verified at P=1152: kernel-vs-oracle maxdiff
    <=1e-4 and ~5% perf cost vs pinned, docs/TPU_RUNS.md r5);
    "1" -> True (always stream); "0" -> False (never — over-budget
    pools fall back to the XLA gather path). Parsed, not truthiness.
    Same jit-cache staleness caveat as _variant()."""
    v = os.environ.get("LLMC_ATTN_SCALE_DMA", "")
    if v in ("", "auto"):
        return None
    return v not in ("0", "false", "False")


def _flat_nbuf() -> int:
    """Ring depth of the flat kernel's global DMA pipeline: NBUF page
    buffers, NBUF-1 pages in flight while one computes. 2 = plain double
    buffering; 4 (default) hides DMA issue + semaphore latency behind ~3
    pages of compute. VMEM: 2*NBUF*NH*HS*ps*itemsize (~1.6MB at 1.5B
    int8). Read per trace (like _variant) so perf probes can sweep it."""
    return max(2, int(os.environ.get("LLMC_ATTN_NBUF", "4")))

# The int8-KV DMA kernel holds both whole (P, NH, ps) f32 scale arrays in
# VMEM (~25.6KB/page at 1.5B shapes). The binding limit is NOT the 128MB
# physical VMEM but XLA:TPU's 16MB SCOPED-vmem stack for kernel locals:
# r5 measured a compile-time "Ran out of memory in memory space vmem ...
# limit 16.00M" crash at 14.2MB of scales + ring buffers (124M shapes,
# P=1152). Budget 12MB leaves ~4MB for the double-buffered page ring;
# bigger pools stream scales through the ring (flat kernel, O(NBUF)
# VMEM) or fall back to the XLA gather path.
_SCALE_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _make_flash_decode_gridb_kernel(quant: bool):
    """Build the (B,)-grid flash-decode kernel (round-2 serving variant,
    now the fallback behind the flat kernel): one Mosaic program per
    sequence walks ONLY the live page range [start//ps, (length-1)//ps]
    with pltpu.make_async_copy double buffering, so dead pages are never
    touched and per-page overhead is a semaphore wait (pallas_guide.md
    'Patterns: Double Buffering'). The grid-(B, pages_per_seq) pipelined
    kernel it replaced (_make_paged_decode_grid_kernel) measured ~10x off
    the chip's ~600GB/s streaming rate at 1.5B (fixed per-grid-step
    overhead on ~200KB payloads + all-table-entry fetches).

    The pool layout (P, NH, HS, ps) exists precisely for this kernel:
    `pool.at[page]` is a single contiguous leading-dim slice whose minor
    dims (HS=64 sublanes, ps=128 lanes) meet Mosaic's async-copy
    alignment rules (GPT-2's HS=64 cannot be a lane dim). Requires
    ps % 128 == 0 — the wrapper falls back otherwise.

    quant=True streams int8 pages (dequant fused into the load) with the
    whole (P, NH, ps) f32 scale arrays resident in VMEM — no per-page
    scale DMA. Outputs are UNNORMALIZED (acc, m, l) parts."""

    def kernel(lengths_ref, starts_ref, tables_ref, q_ref, k_hbm, v_hbm,
               *rest):
        if quant:
            ksc_ref, vsc_ref, out_ref, m_out, l_out, kbuf, vbuf, sems = rest
        else:
            out_ref, m_out, l_out, kbuf, vbuf, sems = rest
        b = pl.program_id(0)
        HS, ps = kbuf.shape[2], kbuf.shape[3]
        length = lengths_ref[b]
        start = starts_ref[b]
        first = start // ps
        last = jnp.where(length > 0, (length - 1) // ps, -1)
        num = jnp.maximum(last - first + 1, 0)

        def kdma(slot, ordinal):
            page = tables_ref[b, first + ordinal]
            return pltpu.make_async_copy(k_hbm.at[page], kbuf.at[slot],
                                         sems.at[slot, 0])

        def vdma(slot, ordinal):
            page = tables_ref[b, first + ordinal]
            return pltpu.make_async_copy(v_hbm.at[page], vbuf.at[slot],
                                         sems.at[slot, 1])

        @pl.when(num > 0)
        def _warmup():
            kdma(0, 0).start()
            vdma(0, 0).start()

        # f32 compute + HIGHEST dots, always: the opt-in bf16 compute
        # path (LLMC_ATTN_BF16) was deleted r5 — r4 measured it
        # -27% on the isolated layer call but ZERO on the full
        # chunk (the kernel is not the step's serial bottleneck),
        # while its ~4e-3 PV rounding broke the engine's
        # token-equality guarantees (docs/DESIGN.md)
        cd, prec = jnp.float32, jax.lax.Precision.HIGHEST
        # cast to f32 BEFORE the singleton-dim reshape: Mosaic rejects
        # the bf16 (1,NH,HS)->(NH,1,HS) shape cast ("unsupported shape
        # cast") when q arrives bf16; the f32 relayout is supported
        q3 = q_ref[0].astype(jnp.float32)[:, None, :]
        scale = jax.lax.rsqrt(jnp.float32(HS))

        def body(i, carry):
            m, l, acc = carry
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < num)
            def _prefetch():
                kdma(1 - slot, i + 1).start()
                vdma(1 - slot, i + 1).start()

            kdma(slot, i).wait()
            vdma(slot, i).wait()
            # int8: scales fold in AFTER the dots — scores = (q·k)*ks
            # per column and pv = (p*vs)·v — turning two per-ELEMENT
            # dequant multiplies over (NH, HS, ps) into per-COLUMN
            # (NH, ps) ones (the cast feeds the MXU directly). Same
            # math, ~HS x fewer VPU multiplies; kernel-vs-oracle diffs
            # stay ~1e-7 (dot products of exact int8 values in f32).
            k = kbuf[slot].astype(cd)                 # (NH, HS, ps)
            v = vbuf[slot].astype(cd)
            scores = jax.lax.dot_general(
                q3, k,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec,
            )[:, 0, :] * scale                        # (NH, ps)
            if quant:
                page = tables_ref[b, first + i]
                scores = scores * ksc_ref[page]
            pos = (first + i) * ps + jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, 1)
            scores = jnp.where((pos < length) & (pos >= start), scores,
                               NEG_INF)
            m_cur = jnp.max(scores, axis=1, keepdims=True)
            m_new = jnp.maximum(m, m_cur)
            p = jnp.exp(scores - m_new)
            # fully-masked page: every score NEG_INF makes m_new NEG_INF
            # and exp(0)=1 claim the page's whole mass (l += ps, acc +=
            # garbage v). Zero those lanes — the parts contract is
            # l = VALID mass (the XLA oracle's jnp.where(valid, exp, 0)).
            p = jnp.where(scores > NEG_INF * 0.5, p, 0.0)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            if quant:
                page = tables_ref[b, first + i]
                p = p * vsc_ref[page]     # post-dot V dequant (see above)
            pv = jax.lax.dot_general(
                p[:, None, :].astype(cd), v,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec,
            )[:, 0, :]
            return m_new, l_new, acc * alpha + pv

        NH = q3.shape[0]
        m0 = jnp.full((NH, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((NH, 1), jnp.float32)
        a0 = jnp.zeros((NH, HS), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, num, body, (m0, l0, a0))
        # UNNORMALIZED outputs: callers either normalize (acc / l) or
        # merge with another attention source via online-softmax parts
        out_ref[0] = acc.astype(out_ref.dtype)
        m_out[0] = m
        l_out[0] = l

    return kernel


def _make_flash_decode_flat_kernel(B: int, quant: bool,
                                   scale_dma: bool = False):
    """Build the FLAT serving kernel: one Mosaic program (grid (1,)) that
    walks every sequence's live page range in a single globally
    pipelined DMA stream.

    Why flat: the (B,)-grid kernels above launch B sequential Mosaic
    programs per layer-call; each pays pipeline setup and drains its
    double buffer at the program boundary (the next program's first page
    DMA cannot start until the previous program ends). At 1.5B decode
    shapes that fixed overhead — not page bytes — dominates the layer
    call. Here the batch loop is unrolled INSIDE one program and the DMA
    pipeline runs through sequence boundaries: while sequence b's last
    page computes, the next NBUF-1 pages (wherever they live in the
    batch) are already in flight.

    The prefetch schedule is made trivial by FLATTENING first: a scalar
    prologue writes every live page index, in visit order, into an SMEM
    scratch (`sched`). The main loop then runs a classic NBUF-slot ring
    over that flat list — wait slot g%NBUF, issue page g+NBUF-1 —
    regardless of where sequence boundaries fall. Prefetch depth is
    NBUF-1 pages (LLMC_ATTN_NBUF, default 4 → 3 in flight), chosen so a
    single page's DMA issue+semaphore latency hides behind several
    pages of compute, not just one.
    """

    def kernel(lengths_ref, starts_ref, tables_ref, q_ref, k_hbm, v_hbm,
               *rest):
        ksbuf = vsbuf = ksc_ref = None
        if quant and scale_dma:
            # scale arrays stay in HBM and ride the same ring as their
            # pages (streams 2/3) — VMEM use is O(NBUF), not O(pool).
            # OPT-IN (LLMC_ATTN_SCALE_DMA=1): the (NH, ps) scale block
            # has a non-8-multiple sublane count at GPT-2 head counts,
            # which Mosaic's DMA alignment rules may reject — unverified
            # on hardware, so the default keeps scales whole in VMEM.
            (ksc_hbm, vsc_hbm, out_ref, m_out, l_out, kbuf, vbuf,
             ksbuf, vsbuf, sems, sched_ref) = rest
        elif quant:
            # whole (P, NH, ps) scale arrays pinned in VMEM (same as the
            # grid kernel; the dispatch bounds P via the VMEM budget)
            (ksc_ref, vsc_ref, out_ref, m_out, l_out, kbuf, vbuf, sems,
             sched_ref) = rest
        else:
            out_ref, m_out, l_out, kbuf, vbuf, sems, sched_ref = rest
        NBUF, NH, HS, ps = kbuf.shape
        scale = jax.lax.rsqrt(jnp.float32(HS))
        # f32 compute + HIGHEST dots, always: the opt-in bf16 compute
        # path (LLMC_ATTN_BF16) was deleted r5 — r4 measured it
        # -27% on the isolated layer call but ZERO on the full
        # chunk (the kernel is not the step's serial bottleneck),
        # while its ~4e-3 PV rounding broke the engine's
        # token-equality guarantees (docs/DESIGN.md)
        cd, prec = jnp.float32, jax.lax.Precision.HIGHEST

        firsts = [starts_ref[b] // ps for b in range(B)]
        nums = []
        for b in range(B):
            length = lengths_ref[b]
            last = jnp.where(length > 0, (length - 1) // ps, -1)
            nums.append(jnp.maximum(last - firsts[b] + 1, 0))

        # ---- prologue: flatten the live-page visit order into SMEM ----
        ord0 = jnp.int32(0)
        for b in range(B):
            def fill(i, o, b=b, first_b=firsts[b]):
                sched_ref[o] = tables_ref[b, first_b + i]
                return o + 1
            ord0 = jax.lax.fori_loop(0, nums[b], fill, ord0)
        total = ord0

        def start_pair(slot, page):
            pltpu.make_async_copy(k_hbm.at[page], kbuf.at[slot],
                                  sems.at[slot, 0]).start()
            pltpu.make_async_copy(v_hbm.at[page], vbuf.at[slot],
                                  sems.at[slot, 1]).start()
            if quant and scale_dma:
                pltpu.make_async_copy(ksc_hbm.at[page], ksbuf.at[slot],
                                      sems.at[slot, 2]).start()
                pltpu.make_async_copy(vsc_hbm.at[page], vsbuf.at[slot],
                                      sems.at[slot, 3]).start()

        def wait_pair(slot, page):
            pltpu.make_async_copy(k_hbm.at[page], kbuf.at[slot],
                                  sems.at[slot, 0]).wait()
            pltpu.make_async_copy(v_hbm.at[page], vbuf.at[slot],
                                  sems.at[slot, 1]).wait()
            if quant and scale_dma:
                pltpu.make_async_copy(ksc_hbm.at[page], ksbuf.at[slot],
                                      sems.at[slot, 2]).wait()
                pltpu.make_async_copy(vsc_hbm.at[page], vsbuf.at[slot],
                                      sems.at[slot, 3]).wait()

        # warmup: fill the ring NBUF-1 deep
        for j in range(NBUF - 1):
            @pl.when(j < total)
            def _warmup(j=j):
                start_pair(j, sched_ref[j])

        ord_ = jnp.int32(0)   # global page ordinal → ring slot
        for b in range(B):
            num_b, first_b = nums[b], firsts[b]
            length, start = lengths_ref[b], starts_ref[b]
            # f32-first reshape (see the gridb kernel comment)
            q3 = q_ref[b].astype(jnp.float32)[:, None, :]

            def body(i, carry, b=b, num_b=num_b, first_b=first_b,
                     length=length, start=start, q3=q3, total=total):
                ord_, m, l, acc = carry
                slot = jax.lax.rem(ord_, NBUF)

                @pl.when(ord_ + NBUF - 1 < total)
                def _prefetch():
                    start_pair(jax.lax.rem(ord_ + NBUF - 1, NBUF),
                               sched_ref[ord_ + NBUF - 1])

                page = tables_ref[b, first_b + i]
                wait_pair(slot, page)
                # int8 scales fold in POST-dot (per column, not per
                # element — see the gridb kernel comment)
                k = kbuf[slot].astype(cd)
                v = vbuf[slot].astype(cd)
                scores = jax.lax.dot_general(
                    q3, k,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )[:, 0, :] * scale                    # (NH, ps)
                if quant:
                    scores = scores * (ksbuf[slot] if scale_dma
                                       else ksc_ref[page])
                pos = (first_b + i) * ps + jax.lax.broadcasted_iota(
                    jnp.int32, scores.shape, 1)
                scores = jnp.where((pos < length) & (pos >= start), scores,
                                   NEG_INF)
                m_cur = jnp.max(scores, axis=1, keepdims=True)
                m_new = jnp.maximum(m, m_cur)
                p = jnp.exp(scores - m_new)
                # fully-masked page: every score NEG_INF makes
                # m_new NEG_INF and exp(0)=1 claim the page's whole
                # mass (l += ps, acc += garbage v). Zero those
                # lanes — the parts contract is l = VALID mass
                # (the XLA oracle's jnp.where(valid, exp, 0)).
                p = jnp.where(scores > NEG_INF * 0.5, p, 0.0)
                alpha = jnp.exp(m - m_new)
                l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
                if quant:
                    p = p * (vsbuf[slot] if scale_dma else vsc_ref[page])
                pv = jax.lax.dot_general(
                    p[:, None, :].astype(cd), v,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )[:, 0, :]
                return ord_ + 1, m_new, l_new, acc * alpha + pv

            m0 = jnp.full((NH, 1), NEG_INF, jnp.float32)
            l0 = jnp.zeros((NH, 1), jnp.float32)
            a0 = jnp.zeros((NH, HS), jnp.float32)
            ord_, m, l, acc = jax.lax.fori_loop(0, num_b, body,
                                                (ord_, m0, l0, a0))
            out_ref[b] = acc.astype(out_ref.dtype)
            m_out[b] = m
            l_out[b] = l

    return kernel


def _flat_parts_call(q, k_pages, v_pages, block_tables, lengths, starts,
                     scales, interpret: bool, scale_dma=None):
    """pallas_call wrapper shared by the float/quant flat kernels.
    ``scale_dma``: None resolves from the env tri-state (False on auto);
    the quant dispatchers pass their budget-aware decision through."""
    B, NH, HS = q.shape
    P, _, _, ps = k_pages.shape
    pages_per_seq = block_tables.shape[1]
    quant = scales is not None
    in_specs = [
        pl.BlockSpec((B, NH, HS), lambda i, *_: (0, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    operands = [q, k_pages, v_pages]
    if scale_dma is None:
        scale_dma = bool(_scale_dma())
    if quant:
        in_specs += ([pl.BlockSpec(memory_space=pltpu.HBM)] * 2
                     if scale_dma else
                     [pl.BlockSpec((P, NH, ps), lambda i, *_: (0, 0, 0)),
                      pl.BlockSpec((P, NH, ps), lambda i, *_: (0, 0, 0))])
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
            [pltpu.VMEM((_flat_nbuf(), NH, HS, ps), k_pages.dtype),
             pltpu.VMEM((_flat_nbuf(), NH, HS, ps), v_pages.dtype)]
            + ([pltpu.VMEM((_flat_nbuf(), NH, ps), jnp.float32),
                pltpu.VMEM((_flat_nbuf(), NH, ps), jnp.float32)]
               if quant and scale_dma else [])
            + [pltpu.SemaphoreType.DMA(
                   (_flat_nbuf(), 4 if quant and scale_dma else 2)),
               pltpu.SMEM((B * pages_per_seq,), jnp.int32)]
        ),
    )
    kv_bytes = 2 * B * NH * pages_per_seq * ps * HS \
        * jnp.dtype(k_pages.dtype).itemsize
    if quant and not scale_dma:
        # the whole (P, NH, ps) f32 scale arrays are pipeline-copied
        # HBM->VMEM per call — real traffic the scheduler should see
        # (the scale_dma ring streams O(NBUF) pages instead)
        kv_bytes += 2 * P * NH * ps * 4
    acc, m, l = pl.pallas_call(
        _make_flash_decode_flat_kernel(B, quant, scale_dma),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, NH, HS), jnp.float32),
                   jax.ShapeDtypeStruct((B, NH, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, NH, 1), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * NH * pages_per_seq * ps * HS,
            bytes_accessed=kv_bytes + B * NH * HS * 4,
            transcendentals=B * NH * pages_per_seq * ps,
        ),
    )(lengths, starts, block_tables, *operands)
    return acc, m[..., 0], l[..., 0]

def _make_flash_decode_flat_mq_kernel(B: int, KQ: int, quant: bool,
                                      scale_dma: bool = False):
    """Multi-query (query-block) variant of the flat serving kernel, for
    SPECULATIVE DECODE verification: KQ query tokens per sequence score
    against the SAME page walk — the pool is read once per step however
    many draft tokens are being verified, which is what makes greedy
    speculation nearly free on a bandwidth-bound decode. Per page the
    (NH,1,HS)x(NH,HS,ps) GEMV of the KQ=1 kernel becomes an
    (NH,KQ,HS)x(NH,HS,ps) GEMM; online-softmax state (m, l, acc) carries a
    KQ dim. No causal structure here: every query position >= pool length,
    so all KQ queries attend the whole committed prefix (the in-flight
    block's causal part rides the decode-chunk TAIL, models/gpt2_paged.py).

    Kept separate from _make_flash_decode_flat_kernel on purpose: that
    kernel's compiled layout is hardware-verified; folding KQ=1 into this
    builder would change its block shapes. Unify once the mq path has its
    own on-chip record."""

    def kernel(lengths_ref, starts_ref, tables_ref, q_ref, k_hbm, v_hbm,
               *rest):
        ksbuf = vsbuf = ksc_ref = vsc_ref = None
        if quant and scale_dma:
            (ksc_hbm, vsc_hbm, out_ref, m_out, l_out, kbuf, vbuf,
             ksbuf, vsbuf, sems, sched_ref) = rest
        elif quant:
            (ksc_ref, vsc_ref, out_ref, m_out, l_out, kbuf, vbuf, sems,
             sched_ref) = rest
        else:
            out_ref, m_out, l_out, kbuf, vbuf, sems, sched_ref = rest
        NBUF, NH, HS, ps = kbuf.shape
        scale = jax.lax.rsqrt(jnp.float32(HS))
        # f32 compute + HIGHEST dots, always: the opt-in bf16 compute
        # path (LLMC_ATTN_BF16) was deleted r5 — r4 measured it
        # -27% on the isolated layer call but ZERO on the full
        # chunk (the kernel is not the step's serial bottleneck),
        # while its ~4e-3 PV rounding broke the engine's
        # token-equality guarantees (docs/DESIGN.md)
        cd, prec = jnp.float32, jax.lax.Precision.HIGHEST

        firsts = [starts_ref[b] // ps for b in range(B)]
        nums = []
        for b in range(B):
            length = lengths_ref[b]
            last = jnp.where(length > 0, (length - 1) // ps, -1)
            nums.append(jnp.maximum(last - firsts[b] + 1, 0))

        ord0 = jnp.int32(0)
        for b in range(B):
            def fill(i, o, b=b, first_b=firsts[b]):
                sched_ref[o] = tables_ref[b, first_b + i]
                return o + 1
            ord0 = jax.lax.fori_loop(0, nums[b], fill, ord0)
        total = ord0

        def start_pair(slot, page):
            pltpu.make_async_copy(k_hbm.at[page], kbuf.at[slot],
                                  sems.at[slot, 0]).start()
            pltpu.make_async_copy(v_hbm.at[page], vbuf.at[slot],
                                  sems.at[slot, 1]).start()
            if quant and scale_dma:
                pltpu.make_async_copy(ksc_hbm.at[page], ksbuf.at[slot],
                                      sems.at[slot, 2]).start()
                pltpu.make_async_copy(vsc_hbm.at[page], vsbuf.at[slot],
                                      sems.at[slot, 3]).start()

        def wait_pair(slot, page):
            pltpu.make_async_copy(k_hbm.at[page], kbuf.at[slot],
                                  sems.at[slot, 0]).wait()
            pltpu.make_async_copy(v_hbm.at[page], vbuf.at[slot],
                                  sems.at[slot, 1]).wait()
            if quant and scale_dma:
                pltpu.make_async_copy(ksc_hbm.at[page], ksbuf.at[slot],
                                      sems.at[slot, 2]).wait()
                pltpu.make_async_copy(vsc_hbm.at[page], vsbuf.at[slot],
                                      sems.at[slot, 3]).wait()

        for j in range(NBUF - 1):
            @pl.when(j < total)
            def _warmup(j=j):
                start_pair(j, sched_ref[j])

        ord_ = jnp.int32(0)
        for b in range(B):
            num_b, first_b = nums[b], firsts[b]
            length, start = lengths_ref[b], starts_ref[b]
            # (KQ, NH, HS) -> (NH, KQ, HS): NH is the dot batch dim.
            # Transpose in f32 first (bf16 relayouts are rejected; see
            # the gridb kernel comment), cast after.
            q = q_ref[b].astype(jnp.float32).swapaxes(0, 1)

            def body(i, carry, b=b, num_b=num_b, first_b=first_b,
                     length=length, start=start, q=q, total=total):
                ord_, m, l, acc = carry
                slot = jax.lax.rem(ord_, NBUF)

                @pl.when(ord_ + NBUF - 1 < total)
                def _prefetch():
                    start_pair(jax.lax.rem(ord_ + NBUF - 1, NBUF),
                               sched_ref[ord_ + NBUF - 1])

                page = tables_ref[b, first_b + i]
                wait_pair(slot, page)
                # int8 scales fold in POST-dot (per column, not per
                # element — see the gridb kernel comment)
                k = kbuf[slot].astype(cd)
                v = vbuf[slot].astype(cd)
                scores = jax.lax.dot_general(
                    q, k,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                ) * scale                             # (NH, KQ, ps)
                if quant:
                    ks_row = ksbuf[slot] if scale_dma else ksc_ref[page]
                    scores = scores * ks_row[:, None, :]
                pos = (first_b + i) * ps + jax.lax.broadcasted_iota(
                    jnp.int32, scores.shape, 2)
                scores = jnp.where((pos < length) & (pos >= start), scores,
                                   NEG_INF)
                m_cur = jnp.max(scores, axis=2, keepdims=True)
                m_new = jnp.maximum(m, m_cur)         # (NH, KQ, 1)
                p = jnp.exp(scores - m_new)
                # fully-masked page: every score NEG_INF makes
                # m_new NEG_INF and exp(0)=1 claim the page's whole
                # mass (l += ps, acc += garbage v). Zero those
                # lanes — the parts contract is l = VALID mass
                # (the XLA oracle's jnp.where(valid, exp, 0)).
                p = jnp.where(scores > NEG_INF * 0.5, p, 0.0)
                alpha = jnp.exp(m - m_new)
                l_new = l * alpha + jnp.sum(p, axis=2, keepdims=True)
                if quant:
                    vs_row = vsbuf[slot] if scale_dma else vsc_ref[page]
                    p = p * vs_row[:, None, :]
                pv = jax.lax.dot_general(
                    p.astype(cd), v,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )                                     # (NH, KQ, HS)
                return ord_ + 1, m_new, l_new, acc * alpha + pv

            m0 = jnp.full((NH, KQ, 1), NEG_INF, jnp.float32)
            l0 = jnp.zeros((NH, KQ, 1), jnp.float32)
            a0 = jnp.zeros((NH, KQ, HS), jnp.float32)
            ord_, m, l, acc = jax.lax.fori_loop(0, num_b, body,
                                                (ord_, m0, l0, a0))
            out_ref[b] = acc.swapaxes(0, 1).astype(out_ref.dtype)
            m_out[b] = m[..., 0].swapaxes(0, 1)[..., None]
            l_out[b] = l[..., 0].swapaxes(0, 1)[..., None]

    return kernel


def _flat_parts_mq_call(q, k_pages, v_pages, block_tables, lengths, starts,
                        scales, interpret: bool, scale_dma=None):
    """pallas_call wrapper for the multi-query flat kernels."""
    B, KQ, NH, HS = q.shape
    P, _, _, ps = k_pages.shape
    pages_per_seq = block_tables.shape[1]
    quant = scales is not None
    in_specs = [
        pl.BlockSpec((B, KQ, NH, HS), lambda i, *_: (0, 0, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    operands = [q, k_pages, v_pages]
    if scale_dma is None:
        scale_dma = bool(_scale_dma())
    if quant:
        in_specs += ([pl.BlockSpec(memory_space=pltpu.HBM)] * 2
                     if scale_dma else
                     [pl.BlockSpec((P, NH, ps), lambda i, *_: (0, 0, 0)),
                      pl.BlockSpec((P, NH, ps), lambda i, *_: (0, 0, 0))])
        operands += list(scales)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((B, KQ, NH, HS), lambda i, *_: (0, 0, 0, 0)),
            pl.BlockSpec((B, KQ, NH, 1), lambda i, *_: (0, 0, 0, 0)),
            pl.BlockSpec((B, KQ, NH, 1), lambda i, *_: (0, 0, 0, 0)),
        ],
        scratch_shapes=(
            [pltpu.VMEM((_flat_nbuf(), NH, HS, ps), k_pages.dtype),
             pltpu.VMEM((_flat_nbuf(), NH, HS, ps), v_pages.dtype)]
            + ([pltpu.VMEM((_flat_nbuf(), NH, ps), jnp.float32),
                pltpu.VMEM((_flat_nbuf(), NH, ps), jnp.float32)]
               if quant and scale_dma else [])
            + [pltpu.SemaphoreType.DMA(
                   (_flat_nbuf(), 4 if quant and scale_dma else 2)),
               pltpu.SMEM((B * pages_per_seq,), jnp.int32)]
        ),
    )
    kv_bytes = 2 * B * NH * pages_per_seq * ps * HS \
        * jnp.dtype(k_pages.dtype).itemsize
    if quant and not scale_dma:
        # the whole (P, NH, ps) f32 scale arrays are pipeline-copied
        # HBM->VMEM per call — real traffic the scheduler should see
        # (the scale_dma ring streams O(NBUF) pages instead)
        kv_bytes += 2 * P * NH * ps * 4
    acc, m, l = pl.pallas_call(
        _make_flash_decode_flat_mq_kernel(B, KQ, quant, scale_dma),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, KQ, NH, HS), jnp.float32),
                   jax.ShapeDtypeStruct((B, KQ, NH, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, KQ, NH, 1), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * KQ * NH * pages_per_seq * ps * HS,
            bytes_accessed=kv_bytes + B * KQ * NH * HS * 4,
            transcendentals=B * KQ * NH * pages_per_seq * ps,
        ),
    )(lengths, starts, block_tables, *operands)
    return acc, m[..., 0], l[..., 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_decode_attention_parts_mq(q: jax.Array, k_pages: jax.Array,
                                    v_pages: jax.Array,
                                    block_tables: jax.Array,
                                    lengths: jax.Array,
                                    starts: jax.Array | None = None,
                                    interpret: bool = False):
    """Multi-query flash-decode over paged KV: q is (B, KQ, NH, HS) — KQ
    query tokens per sequence, all attending the same committed prefix
    [starts, lengths) — returning UNNORMALIZED parts (acc (B,KQ,NH,HS),
    m/l (B,KQ,NH)). One page walk serves all KQ queries (see
    _make_flash_decode_flat_mq_kernel). Falls back to the XLA-gather
    oracle off the flat/ps%128 path."""
    B, KQ, NH, HS = q.shape
    if starts is None:
        starts = jnp.zeros_like(lengths)
    ps = k_pages.shape[3]
    if ps % 128 != 0 or not _flat_ok(B, block_tables.shape[1]):
        return paged_decode_attention_parts_mq_xla(
            q, k_pages, v_pages, block_tables, lengths, starts)
    return _flat_parts_mq_call(q, k_pages, v_pages, block_tables, lengths,
                               starts, None, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_decode_attention_quant_parts_mq(q: jax.Array, k_pages: jax.Array,
                                          v_pages: jax.Array,
                                          k_scale: jax.Array,
                                          v_scale: jax.Array,
                                          block_tables: jax.Array,
                                          lengths: jax.Array,
                                          starts: jax.Array | None = None,
                                          interpret: bool = False):
    """INT8-KV multi-query parts (see paged_decode_attention_parts_mq)."""
    B, KQ, NH, HS = q.shape
    P, _, _, ps = k_pages.shape
    if starts is None:
        starts = jnp.zeros_like(lengths)
    over = 2 * P * NH * ps * 4 > _SCALE_VMEM_BUDGET_BYTES
    pref = _scale_dma()
    scale_dma_ok = (_variant() == "flat"
                    and (pref if pref is not None else over))
    if ps % 128 != 0 or not _flat_ok(B, block_tables.shape[1]) or \
            (over and not scale_dma_ok):
        return paged_decode_attention_quant_parts_mq_xla(
            q, k_pages, v_pages, k_scale, v_scale, block_tables, lengths,
            starts)
    return _flat_parts_mq_call(q, k_pages, v_pages, block_tables, lengths,
                               starts, (k_scale, v_scale), interpret,
                               scale_dma=scale_dma_ok)


def _make_paged_decode_grid_kernel(quant: bool):
    """Build the LAB grid-(B, pages_per_seq) pipelined kernel: one page
    per grid step via scalar-prefetched index maps, ALL table entries
    fetched. Measured ~10x off streaming rate at 1.5B — kept as the
    measured design record and as the ps<128 fallback of the NORMALIZED
    wrappers (it has no DMA alignment floor). quant=True fuses the int8
    dequant into the page load with per-page (1, NH, ps) scale blocks
    riding the same pipeline. Emits NORMALIZED attention."""

    def kernel(lengths_ref, starts_ref, tables_ref, q_ref, k_ref, v_ref,
               *rest):
        if quant:
            ks_ref, vs_ref, out_ref, m_ref, l_ref, acc_ref = rest
        else:
            out_ref, m_ref, l_ref, acc_ref = rest
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
            if quant:
                k = k_ref[0].astype(jnp.float32) * ks_ref[0][:, None, :]
                v = v_ref[0].astype(jnp.float32) * vs_ref[0][:, None, :]
            else:
                k = k_ref[0].astype(jnp.float32)        # (NH, HS, ps)
                v = v_ref[0].astype(jnp.float32)
            scale = jax.lax.rsqrt(jnp.float32(q.shape[-1]))
            # batched GEMV: scores[h, p] = q[h] · k[h, p]
            scores = jax.lax.dot_general(
                q[:, None, :], k,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )[:, 0, :] * scale                          # (NH, ps)
            pos = i * ps + jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, 1)
            scores = jnp.where((pos < length) & (pos >= start), scores,
                               NEG_INF)

            m_prev, l_prev = m_ref[...], l_ref[...]
            m_cur = jnp.max(scores, axis=1, keepdims=True)   # (NH, 1)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(scores - m_new)
            # fully-masked page (the page guard above admits e.g.
            # length=5, start=7): zero the NEG_INF lanes or exp(0)=1
            # claims the page's whole probability mass
            p = jnp.where(scores > NEG_INF * 0.5, p, 0.0)
            alpha = jnp.exp(m_prev - m_new)                  # (NH, 1)
            l_ref[...] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                p[:, None, :], v,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )[:, 0, :]                                       # (NH, HS)
            m_ref[...] = m_new
            acc_ref[...] = acc_ref[...] * alpha + pv

        @pl.when(i == num_pages_per_seq - 1)
        def _finalize():
            l = l_ref[...]
            l = jnp.where(l == 0.0, 1.0, l)   # masked rows → zeros, not NaN
            out_ref[0] = (acc_ref[...] / l).astype(out_ref.dtype)

    return kernel

@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_decode_attention_parts(q: jax.Array, k_pages: jax.Array,
                                 v_pages: jax.Array, block_tables: jax.Array,
                                 lengths: jax.Array,
                                 starts: jax.Array | None = None,
                                 interpret: bool = False):
    """Flash-decode over paged KV returning UNNORMALIZED online-softmax
    parts (acc (B,NH,HS) f32, m (B,NH) f32, l (B,NH) f32) so callers can
    merge with another attention source (the decode chunk merges the
    read-only pool prefix with its in-flight tail this way). The manual-DMA
    kernel needs ps % 128 == 0; other page sizes use the XLA-gather parts
    oracle.

    q:            (B, NH, HS) — one query token per sequence
    k_pages/v_pages: (P, NH, HS, page_size) pool (one layer, page-major,
                  token-minor)
    block_tables: (B, pages_per_seq) int32 — page ids per sequence, in order
    lengths:      (B,) int32 — valid tokens per sequence
    starts:       (B,) int32 optional sliding-window lower bound (the
                  `offset` of attention_paged, paged_infer.c:165,190);
                  positions < start are masked and pages outside the live
                  range [start//ps, (length-1)//ps] are never fetched
    """
    B, NH, HS = q.shape
    if starts is None:
        starts = jnp.zeros_like(lengths)
    P, _, _, ps = k_pages.shape
    pages_per_seq = block_tables.shape[1]
    if ps % 128 != 0:
        return paged_decode_attention_parts_xla(q, k_pages, v_pages,
                                                block_tables, lengths,
                                                starts)
    if _flat_ok(B, pages_per_seq):
        return _flat_parts_call(q, k_pages, v_pages, block_tables, lengths,
                                starts, None, interpret)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, NH, HS), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),  # pool stays in HBM
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, NH, HS), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, NH, 1), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, NH, 1), lambda b, *_: (b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NH, HS, ps), k_pages.dtype),
            pltpu.VMEM((2, NH, HS, ps), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    acc, m, l = pl.pallas_call(
        _make_flash_decode_gridb_kernel(quant=False),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, NH, HS), jnp.float32),
                   jax.ShapeDtypeStruct((B, NH, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, NH, 1), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * NH * pages_per_seq * ps * HS,
            bytes_accessed=(2 * B * NH * pages_per_seq * ps * HS + B * NH * HS)
            * jnp.dtype(k_pages.dtype).itemsize,
            transcendentals=B * NH * pages_per_seq * ps,
        ),
    )(lengths, starts, block_tables, q, k_pages, v_pages)
    return acc, m[..., 0], l[..., 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_decode_attention(q: jax.Array, k_pages: jax.Array,
                           v_pages: jax.Array, block_tables: jax.Array,
                           lengths: jax.Array, starts: jax.Array | None = None,
                           interpret: bool = False) -> jax.Array:
    """Normalized flash-decode over paged KV (see
    paged_decode_attention_parts for shapes; the grid-pipelined original
    remains as paged_decode_attention_grid). Returns (B, NH, HS)."""
    P, _, _, ps = k_pages.shape
    if ps % 128 != 0:
        # Mosaic DMA alignment needs 128-multiple lanes (= tokens/page);
        # smaller pages run through the grid-pipelined kernel
        if starts is None:
            starts = jnp.zeros_like(lengths)
        return paged_decode_attention_grid(q, k_pages, v_pages,
                                           block_tables, lengths, starts,
                                           interpret=interpret)
    acc, m, l = paged_decode_attention_parts(q, k_pages, v_pages,
                                             block_tables, lengths, starts,
                                             interpret=interpret)
    l = jnp.where(l == 0.0, 1.0, l)
    return (acc / l[..., None]).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_decode_attention_grid(q: jax.Array, k_pages: jax.Array,
                                v_pages: jax.Array, block_tables: jax.Array,
                                lengths: jax.Array,
                                starts: jax.Array | None = None,
                                interpret: bool = False) -> jax.Array:
    """LAB VARIANT (the original kernel): grid (B, pages_per_seq) with the
    Mosaic pipeline fetching one page per grid step from the
    scalar-prefetched table. Measured ~10x off streaming rate at 1.5B —
    per-grid-step overhead on ~200KB payloads plus dead-page fetches —
    which is why serving now uses the manual-DMA kernel above."""
    B, NH, HS = q.shape
    if starts is None:
        starts = jnp.zeros_like(lengths)
    P, _, _, ps = k_pages.shape
    pages_per_seq = block_tables.shape[1]

    def q_map(b, i, lengths_ref, starts_ref, tables_ref):
        return (b, 0, 0)

    def kv_map(b, i, lengths_ref, starts_ref, tables_ref):
        return (tables_ref[b, i], 0, 0, 0)

    def out_map(b, i, lengths_ref, starts_ref, tables_ref):
        return (b, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, pages_per_seq),
        in_specs=[
            pl.BlockSpec((1, NH, HS), q_map),
            pl.BlockSpec((1, NH, HS, ps), kv_map),
            pl.BlockSpec((1, NH, HS, ps), kv_map),
        ],
        out_specs=pl.BlockSpec((1, NH, HS), out_map),
        scratch_shapes=[
            pltpu.VMEM((NH, 1), jnp.float32),
            pltpu.VMEM((NH, 1), jnp.float32),
            pltpu.VMEM((NH, HS), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_paged_decode_grid_kernel(quant=False),
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


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_decode_attention_quant_parts(q: jax.Array, k_pages: jax.Array,
                                       v_pages: jax.Array,
                                       k_scale: jax.Array,
                                       v_scale: jax.Array,
                                       block_tables: jax.Array,
                                       lengths: jax.Array,
                                       starts: jax.Array | None = None,
                                       interpret: bool = False):
    """INT8-KV flash-decode returning UNNORMALIZED parts (acc, m, l) —
    see paged_decode_attention_parts. k_pages/v_pages: int8
    (P, NH, HS, ps); k_scale/v_scale: (P, NH, ps) f32 (whole array rides
    in VMEM)."""
    B, NH, HS = q.shape
    P, _, _, ps = k_pages.shape
    pages_per_seq = block_tables.shape[1]
    if starts is None:
        starts = jnp.zeros_like(lengths)
    if ps % 128 != 0:
        return paged_decode_attention_quant_parts_xla(
            q, k_pages, v_pages, k_scale, v_scale, block_tables, lengths,
            starts)
    # Both kernels pin the whole (P, NH, ps) f32 scale arrays in VMEM by
    # default, so a pool large enough to oversubscribe VMEM (very long
    # max_context × many slots) routes to the XLA path (trace-time
    # static decision) — unless LLMC_ATTN_SCALE_DMA streams per-page
    # scales through the flat kernel's ring (O(NBUF) VMEM, no limit).
    over = 2 * P * NH * ps * 4 > _SCALE_VMEM_BUDGET_BYTES
    pref = _scale_dma()
    scale_dma_ok = (_variant() == "flat"
                    and (pref if pref is not None else over))
    if over and not scale_dma_ok:
        return paged_decode_attention_quant_parts_xla(
            q, k_pages, v_pages, k_scale, v_scale, block_tables, lengths,
            starts)
    if _flat_ok(B, block_tables.shape[1]):
        return _flat_parts_call(q, k_pages, v_pages, block_tables, lengths,
                                starts, (k_scale, v_scale), interpret,
                                scale_dma=scale_dma_ok)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, NH, HS), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((P, NH, ps), lambda b, *_: (0, 0, 0)),
            pl.BlockSpec((P, NH, ps), lambda b, *_: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, NH, HS), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, NH, 1), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, NH, 1), lambda b, *_: (b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NH, HS, ps), jnp.int8),
            pltpu.VMEM((2, NH, HS, ps), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    acc, m, l = pl.pallas_call(
        _make_flash_decode_gridb_kernel(quant=True),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, NH, HS), jnp.float32),
                   jax.ShapeDtypeStruct((B, NH, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, NH, 1), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * NH * pages_per_seq * ps * HS,
            bytes_accessed=2 * B * NH * pages_per_seq * ps * (HS + 4)
            + B * NH * HS * 4,
            transcendentals=B * NH * pages_per_seq * ps,
        ),
    )(lengths, starts, block_tables, q, k_pages, v_pages, k_scale, v_scale)
    return acc, m[..., 0], l[..., 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_decode_attention_quant(q: jax.Array, k_pages: jax.Array,
                                 v_pages: jax.Array, k_scale: jax.Array,
                                 v_scale: jax.Array, block_tables: jax.Array,
                                 lengths: jax.Array,
                                 starts: jax.Array | None = None,
                                 interpret: bool = False) -> jax.Array:
    """Normalized INT8-KV flash-decode (manual-DMA kernel; the original
    grid-pipelined variant remains as paged_decode_attention_quant_grid)."""
    P, _, _, ps = k_pages.shape
    if ps % 128 != 0:
        if starts is None:
            starts = jnp.zeros_like(lengths)
        return paged_decode_attention_quant_grid(
            q, k_pages, v_pages, k_scale, v_scale, block_tables, lengths,
            starts, interpret=interpret)
    acc, m, l = paged_decode_attention_quant_parts(
        q, k_pages, v_pages, k_scale, v_scale, block_tables, lengths,
        starts, interpret=interpret)
    l = jnp.where(l == 0.0, 1.0, l)
    return (acc / l[..., None]).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_decode_attention_quant_grid(
        q: jax.Array, k_pages: jax.Array,
        v_pages: jax.Array, k_scale: jax.Array,
        v_scale: jax.Array, block_tables: jax.Array,
        lengths: jax.Array,
        starts: jax.Array | None = None,
        interpret: bool = False) -> jax.Array:
    """LAB VARIANT: grid-pipelined INT8-KV flash-decode (see
    paged_decode_attention_grid for why serving moved off it)."""
    B, NH, HS = q.shape
    P, _, _, ps = k_pages.shape
    pages_per_seq = block_tables.shape[1]
    if starts is None:
        starts = jnp.zeros_like(lengths)

    def q_map(b, i, lengths_ref, starts_ref, tables_ref):
        return (b, 0, 0)

    def kv_map(b, i, lengths_ref, starts_ref, tables_ref):
        return (tables_ref[b, i], 0, 0, 0)

    def sc_map(b, i, lengths_ref, starts_ref, tables_ref):
        return (tables_ref[b, i], 0, 0)

    def out_map(b, i, lengths_ref, starts_ref, tables_ref):
        return (b, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, pages_per_seq),
        in_specs=[
            pl.BlockSpec((1, NH, HS), q_map),
            pl.BlockSpec((1, NH, HS, ps), kv_map),
            pl.BlockSpec((1, NH, HS, ps), kv_map),
            pl.BlockSpec((1, NH, ps), sc_map),
            pl.BlockSpec((1, NH, ps), sc_map),
        ],
        out_specs=pl.BlockSpec((1, NH, HS), out_map),
        scratch_shapes=[
            pltpu.VMEM((NH, 1), jnp.float32),
            pltpu.VMEM((NH, 1), jnp.float32),
            pltpu.VMEM((NH, HS), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_paged_decode_grid_kernel(quant=True),
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


def _parts_from_dense(q, k, v, lengths, starts):
    """Unnormalized online-softmax parts over gathered dense KV
    (B, NH, S, HS): the XLA twin of the parts kernels' output contract."""
    B, NH, S, HS = k.shape
    qf = q.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.float32(HS))
    scores = jnp.einsum("bhd,bhkd->bhk", qf, k.astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST) * scale
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, NH, S), 2)
    valid = pos < lengths[:, None, None]
    if starts is not None:
        valid = valid & (pos >= starts[:, None, None])
    scores = jnp.where(valid, scores, NEG_INF)
    m = jnp.max(scores, axis=-1)                   # (B, NH); NEG_INF if none
    p = jnp.where(valid, jnp.exp(scores - m[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("bhk,bhkd->bhd", p, v.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    return acc, m, l


def paged_decode_attention_parts_xla(q, k_pages, v_pages, block_tables,
                                     lengths, starts=None):
    """XLA oracle/fallback for paged_decode_attention_parts."""
    from llmc_paged_tpu.kv.layouts import gather_layer_kv

    k, v = gather_layer_kv(k_pages, v_pages, block_tables)
    return _parts_from_dense(q, k, v, lengths, starts)


def paged_decode_attention_quant_parts_xla(q, k_pages, v_pages, k_scale,
                                           v_scale, block_tables, lengths,
                                           starts=None):
    """XLA oracle/fallback for paged_decode_attention_quant_parts."""
    from llmc_paged_tpu.kv.layouts import dequant_layer, gather_layer_kv

    k, v = gather_layer_kv(dequant_layer(k_pages, k_scale),
                           dequant_layer(v_pages, v_scale), block_tables)
    return _parts_from_dense(q, k, v, lengths, starts)


def _parts_from_dense_mq(q, k, v, lengths, starts):
    """Multi-query twin of _parts_from_dense: q (B, KQ, NH, HS) over
    gathered dense KV (B, NH, S, HS) → acc (B,KQ,NH,HS), m/l (B,KQ,NH)."""
    B, NH, S, HS = k.shape
    qf = q.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.float32(HS))
    scores = jnp.einsum("bqhd,bhkd->bhqk", qf, k.astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST) * scale
    pos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 3)
    valid = pos < lengths[:, None, None, None]
    if starts is not None:
        valid = valid & (pos >= starts[:, None, None, None])
    scores = jnp.where(valid, scores, NEG_INF)
    m = jnp.max(scores, axis=-1)                   # (B, NH, KQ)
    p = jnp.where(valid, jnp.exp(scores - m[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("bhqk,bhkd->bqhd", p, v.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    return acc, m.swapaxes(1, 2), l.swapaxes(1, 2)


def paged_decode_attention_parts_mq_xla(q, k_pages, v_pages, block_tables,
                                        lengths, starts=None):
    """XLA oracle/fallback for paged_decode_attention_parts_mq."""
    from llmc_paged_tpu.kv.layouts import gather_layer_kv

    k, v = gather_layer_kv(k_pages, v_pages, block_tables)
    return _parts_from_dense_mq(q, k, v, lengths, starts)


def paged_decode_attention_quant_parts_mq_xla(q, k_pages, v_pages, k_scale,
                                              v_scale, block_tables,
                                              lengths, starts=None):
    """XLA oracle/fallback for paged_decode_attention_quant_parts_mq."""
    from llmc_paged_tpu.kv.layouts import dequant_layer, gather_layer_kv

    k, v = gather_layer_kv(dequant_layer(k_pages, k_scale),
                           dequant_layer(v_pages, v_scale), block_tables)
    return _parts_from_dense_mq(q, k, v, lengths, starts)
