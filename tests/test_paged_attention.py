"""Paged-attention equivalence tests (test_paged_attn.c pattern: paged ==
dense on random data, :241-253 — plus the ragged/partial-page/eviction
cases the reference lacks). On CPU the kernel runs in interpret mode; the
same code compiles under Mosaic on TPU."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmc_paged_tpu import formats
from llmc_paged_tpu.config import GPT2Config, PageConfig
from llmc_paged_tpu.kv.layouts import (
    PagePool, init_pool, token_coords, write_layer_kv, gather_layer_kv)
from llmc_paged_tpu.kv.manager import BlockManager
from llmc_paged_tpu.models import gpt2, gpt2_paged
from llmc_paged_tpu.ops import layers as L
from llmc_paged_tpu.ops.paged_attention import (
    paged_decode_attention, paged_decode_attention_xla)

INTERP = jax.default_backend() != "tpu"


def rand_case(B=3, NH=4, HS=64, P=16, ps=8, pps=4, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, NH, HS), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((P, NH, HS, ps), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((P, NH, HS, ps), dtype=np.float32))
    tables = jnp.asarray(
        rng.permutation(P)[: B * pps].reshape(B, pps).astype(np.int32))
    return q, k, v, tables, rng


# ps=8 exercises the grid-pipelined kernel, ps=128 the manual-DMA kernel
# (the serving path: ps % 128 == 0 dispatch in paged_decode_attention)
@pytest.mark.parametrize("ps,P", [(8, 16), (128, 14)])
def test_kernel_matches_oracle_ragged(ps, P):
    q, k, v, tables, rng = rand_case(P=P, ps=ps)
    lengths = jnp.asarray(np.array([1, 2 * ps + 1, 4 * ps], dtype=np.int32))
    out_k = paged_decode_attention(q, k, v, tables, lengths, interpret=INTERP)
    out_x = paged_decode_attention_xla(q, k, v, tables, lengths)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ps,P", [(8, 16), (128, 14)])
def test_kernel_zero_length_row(ps, P):
    q, k, v, tables, _ = rand_case(P=P, ps=ps, seed=1)
    lengths = jnp.asarray(np.array([0, 5, ps + 1], dtype=np.int32))
    out = paged_decode_attention(q, k, v, tables, lengths, interpret=INTERP)
    assert np.all(np.asarray(out[0]) == 0.0)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("ps,P", [(8, 16), (128, 14)])
def test_kernel_window_starts(ps, P):
    """Sliding-window lower bounds: dead pages below start//ps are never
    fetched by the DMA kernel and masked by the grid kernel — outputs
    must match the oracle either way."""
    q, k, v, tables, _ = rand_case(P=P, ps=ps, seed=7)
    lengths = jnp.asarray(np.array([4 * ps, 3 * ps + 2, ps], dtype=np.int32))
    starts = jnp.asarray(np.array([2 * ps + 3, ps, 0], dtype=np.int32))
    out_k = paged_decode_attention(q, k, v, tables, lengths, starts,
                                   interpret=INTERP)
    out_x = paged_decode_attention_xla(q, k, v, tables, lengths, starts)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("nbuf", [2, 3, 5])
def test_flat_kernel_ring_depths(nbuf, monkeypatch):
    """The flat serving kernel's DMA ring must be correct at every depth
    (LLMC_ATTN_NBUF), including when the batch's total live pages are
    fewer than the warmup depth (zero-length + one-page rows) and when
    the ring wraps many times (a 4-page row)."""
    monkeypatch.setenv("LLMC_ATTN_VARIANT", "flat")
    monkeypatch.setenv("LLMC_ATTN_NBUF", str(nbuf))
    # jit caches are keyed on avals, not env — without this the nbuf=2
    # parametrization's cached executable would serve all three depths
    jax.clear_caches()
    from llmc_paged_tpu.kv.layouts import quantize_pages
    from llmc_paged_tpu.ops.paged_attention import (
        paged_decode_attention_quant, paged_decode_attention_quant_xla)

    ps, P = 128, 17
    q, k, v, tables, _ = rand_case(B=4, P=P, ps=ps, seed=11)
    lengths = jnp.asarray(np.array([0, 1, 4 * ps, 2 * ps + 3], np.int32))
    starts = jnp.asarray(np.array([0, 0, ps + 5, 0], np.int32))
    out_k = paged_decode_attention(q, k, v, tables, lengths, starts,
                                   interpret=INTERP)
    out_x = paged_decode_attention_xla(q, k, v, tables, lengths, starts)
    live = np.asarray(lengths) > 0
    np.testing.assert_allclose(np.asarray(out_k)[live],
                               np.asarray(out_x)[live],
                               rtol=1e-5, atol=1e-5)
    kq, ks = quantize_pages(k)
    vq, vs = quantize_pages(v)
    out_q = paged_decode_attention_quant(q, kq, vq, ks, vs, tables,
                                         lengths, starts, interpret=INTERP)
    out_qx = paged_decode_attention_quant_xla(q, kq, vq, ks, vs, tables,
                                              lengths, starts)
    np.testing.assert_allclose(np.asarray(out_q)[live],
                               np.asarray(out_qx)[live],
                               rtol=1e-5, atol=2e-5)


def test_lab_flatwide_matches_oracle():
    """LAB artifact regression (ops/dev/lab_flatwide.py): the flatwide
    wide-buffer kernel measured 40x slower compiled (see its docstring)
    but must stay oracle-equivalent as the design record."""
    from llmc_paged_tpu.kv.layouts import quantize_pages
    from llmc_paged_tpu.ops.dev.lab_flatwide import _flatwide_parts_call
    from llmc_paged_tpu.ops.paged_attention import (
        paged_decode_attention_parts_xla,
        paged_decode_attention_quant_parts_xla)

    ps, P, pps, B = 128, 14, 4, 3
    q, k, v, tables, _ = rand_case(B=B, P=P, ps=ps, pps=pps, seed=21)
    lengths = jnp.asarray(np.array([0, 2 * ps + 3, 4 * ps], np.int32))
    starts = jnp.asarray(np.array([0, ps + 5, 2], np.int32))
    live = np.asarray(lengths) > 0
    acc, m, l = _flatwide_parts_call(q, k, v, tables, lengths, starts,
                                     None, INTERP)
    acc_x, m_x, l_x = paged_decode_attention_parts_xla(
        q, k, v, tables, lengths, starts)
    for got, want in ((acc, acc_x), (m, m_x), (l, l_x)):
        np.testing.assert_allclose(np.asarray(got)[live],
                                   np.asarray(want)[live],
                                   rtol=1e-5, atol=1e-5)
    assert np.all(np.isfinite(np.asarray(acc)))
    kq, ks = quantize_pages(k)
    vq, vs = quantize_pages(v)
    acc, m, l = _flatwide_parts_call(q, kq, vq, tables, lengths, starts,
                                     (ks, vs), INTERP)
    acc_x, m_x, l_x = paged_decode_attention_quant_parts_xla(
        q, kq, vq, ks, vs, tables, lengths, starts)
    np.testing.assert_allclose(np.asarray(acc)[live],
                               np.asarray(acc_x)[live],
                               rtol=1e-5, atol=2e-5)


def test_flat_kernel_randomized_schedules():
    """Property sweep for the flat kernel's SMEM schedule + DMA ring:
    random ragged lengths (including zero-length and full rows) and
    window starts across random batch sizes must match the XLA oracle.
    The ring's slot-reuse invariant only breaks on specific live-page
    totals, so coverage comes from many schedules, not one."""
    rng = np.random.default_rng(2024)
    NH, HS, ps = 4, 64, 128
    for case in range(12):
        B = int(rng.integers(1, 7))
        pps = int(rng.integers(1, 5))
        P = B * pps + 1
        q = jnp.asarray(rng.standard_normal((B, NH, HS), dtype=np.float32))
        k = jnp.asarray(
            rng.standard_normal((P, NH, HS, ps), dtype=np.float32))
        v = jnp.asarray(
            rng.standard_normal((P, NH, HS, ps), dtype=np.float32))
        tables = jnp.asarray(
            rng.permutation(P)[: B * pps].reshape(B, pps).astype(np.int32))
        lengths = rng.integers(0, pps * ps + 1, B).astype(np.int32)
        starts = np.asarray([0 if n == 0 else int(rng.integers(0, n))
                             for n in lengths], np.int32)
        out_k = paged_decode_attention(q, k, v, tables,
                                       jnp.asarray(lengths),
                                       jnp.asarray(starts),
                                       interpret=INTERP)
        out_x = paged_decode_attention_xla(q, k, v, tables,
                                           jnp.asarray(lengths),
                                           jnp.asarray(starts))
        live = lengths > 0
        np.testing.assert_allclose(
            np.asarray(out_k)[live], np.asarray(out_x)[live],
            rtol=1e-5, atol=1e-5,
            err_msg=f"case {case}: B={B} pps={pps} lengths={lengths} "
                    f"starts={starts}")


@pytest.mark.parametrize("ps,P", [(8, 16), (128, 14)])
def test_quant_kernel_both_paths(ps, P):
    from llmc_paged_tpu.kv.layouts import quantize_pages
    from llmc_paged_tpu.ops.paged_attention import (
        paged_decode_attention_quant, paged_decode_attention_quant_xla)
    q, k, v, tables, _ = rand_case(P=P, ps=ps, seed=3)
    kq, ks = quantize_pages(k)
    vq, vs = quantize_pages(v)
    lengths = jnp.asarray(np.array([2 * ps + 1, ps, 4 * ps], dtype=np.int32))
    starts = jnp.asarray(np.array([ps + 1, 0, 2 * ps], dtype=np.int32))
    out = paged_decode_attention_quant(q, kq, vq, ks, vs, tables, lengths,
                                       starts, interpret=INTERP)
    ref = paged_decode_attention_quant_xla(q, kq, vq, ks, vs, tables,
                                           lengths, starts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("KQ", [1, 4])
def test_mq_parts_match_oracle(KQ):
    """Multi-query pool parts (speculative-verify path): the flat mq
    kernel's unnormalized (acc, m, l) must match the XLA-gather oracle on
    ragged lengths, zero-length rows, and window starts — and at KQ=1 must
    agree with the single-query parts kernel."""
    from llmc_paged_tpu.ops.paged_attention import (
        paged_decode_attention_parts, paged_decode_attention_parts_mq,
        paged_decode_attention_parts_mq_xla)

    ps, P, B, NH, HS = 128, 14, 3, 4, 64
    rng = np.random.default_rng(21)
    q = jnp.asarray(rng.standard_normal((B, KQ, NH, HS), dtype=np.float32))
    _, k, v, tables, _ = rand_case(B=B, P=P, ps=ps, seed=21)
    lengths = jnp.asarray(np.array([0, 2 * ps + 5, 4 * ps], np.int32))
    starts = jnp.asarray(np.array([0, ps + 3, 0], np.int32))
    acc, m, l = paged_decode_attention_parts_mq(q, k, v, tables, lengths,
                                                starts, interpret=INTERP)
    acc_x, m_x, l_x = paged_decode_attention_parts_mq_xla(
        q, k, v, tables, lengths, starts)
    live = np.asarray(lengths) > 0
    # atol 3e-5: the first compiled-Mosaic run of this test (r4, docs/
    # tpu_evidence_20260819_050144.log) showed 3/2048 elements at
    # 1.63e-5 abs vs the oracle — accumulation-order noise, not a bug
    np.testing.assert_allclose(np.asarray(acc)[live], np.asarray(acc_x)[live],
                               rtol=1e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(m)[live], np.asarray(m_x)[live],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l)[live], np.asarray(l_x)[live],
                               rtol=1e-5, atol=3e-5)
    assert np.all(np.asarray(l)[~live] == 0.0)
    if KQ == 1:
        acc1, m1, l1 = paged_decode_attention_parts(
            q[:, 0], k, v, tables, lengths, starts, interpret=INTERP)
        np.testing.assert_allclose(np.asarray(acc)[:, 0][live],
                                   np.asarray(acc1)[live],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(l)[:, 0][live],
                                   np.asarray(l1)[live],
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ps", [8, 128])
def test_mq_quant_parts_match_oracle(ps):
    """INT8-KV multi-query parts — ps=128 runs the flat mq kernel, ps=8
    falls back to the XLA path (both must agree with the dequant oracle)."""
    from llmc_paged_tpu.kv.layouts import quantize_pages
    from llmc_paged_tpu.ops.paged_attention import (
        paged_decode_attention_quant_parts_mq,
        paged_decode_attention_quant_parts_mq_xla)

    P, B, NH, HS, KQ = 14, 3, 4, 64, 3
    rng = np.random.default_rng(31)
    q = jnp.asarray(rng.standard_normal((B, KQ, NH, HS), dtype=np.float32))
    _, k, v, tables, _ = rand_case(B=B, P=P, ps=ps, seed=31)
    kq_, ks = quantize_pages(k)
    vq_, vs = quantize_pages(v)
    lengths = jnp.asarray(np.array([ps, 3 * ps + 1, 2 * ps], np.int32))
    starts = jnp.asarray(np.array([0, ps, ps // 2], np.int32))
    acc, m, l = paged_decode_attention_quant_parts_mq(
        q, kq_, vq_, ks, vs, tables, lengths, starts, interpret=INTERP)
    acc_x, m_x, l_x = paged_decode_attention_quant_parts_mq_xla(
        q, kq_, vq_, ks, vs, tables, lengths, starts)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_x),
                               rtol=1e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_x),
                               rtol=1e-5, atol=2e-5)


def test_kernel_matches_dense_attention():
    """The full chain: scatter K/V into shuffled pages, then the paged
    kernel must equal dense decode attention over the contiguous layout."""
    B, NH, HS, P, ps, pps = 2, 4, 64, 12, 8, 3
    rng = np.random.default_rng(2)
    S = pps * ps
    k_dense = rng.standard_normal((B, NH, S, HS), dtype=np.float32)
    v_dense = rng.standard_normal((B, NH, S, HS), dtype=np.float32)
    q = jnp.asarray(rng.standard_normal((B, NH, HS), dtype=np.float32))
    lengths_np = np.array([13, 24], dtype=np.int32)

    # scatter each row's first `length` tokens into distinct random pages
    perm = rng.permutation(P)
    tables_np = perm[: B * pps].reshape(B, pps).astype(np.int32)
    k_pages = np.zeros((P, NH, HS, ps), dtype=np.float32)
    v_pages = np.zeros((P, NH, HS, ps), dtype=np.float32)
    for b in range(B):
        for t in range(lengths_np[b]):
            pg, sl = tables_np[b, t // ps], t % ps
            k_pages[pg, :, :, sl] = k_dense[b, :, t]
            v_pages[pg, :, :, sl] = v_dense[b, :, t]

    out_paged = paged_decode_attention(
        q, jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(tables_np), jnp.asarray(lengths_np), interpret=INTERP)
    out_dense = L.decode_attention(q, jnp.asarray(k_dense),
                                   jnp.asarray(v_dense),
                                   jnp.asarray(lengths_np))
    np.testing.assert_allclose(np.asarray(out_paged), np.asarray(out_dense),
                               rtol=1e-5, atol=1e-5)


def test_token_coords_and_scatter_roundtrip():
    B, pps, ps, P, NH, HS = 2, 3, 4, 8, 2, 8
    tables = jnp.asarray(np.array([[3, 1, 6], [0, 5, 2]], dtype=np.int32))
    positions = jnp.asarray(np.array([[4], [11]], dtype=np.int32))
    valid = jnp.ones_like(positions, dtype=bool)
    page, slot = token_coords(tables, positions, ps, valid, P)
    np.testing.assert_array_equal(np.asarray(page), [[1], [2]])
    np.testing.assert_array_equal(np.asarray(slot), [[0], [3]])
    # invalid rows are dropped
    page2, slot2 = token_coords(tables, positions, ps,
                                jnp.zeros_like(valid), P)
    np.testing.assert_array_equal(np.asarray(page2), [[P], [P]])
    k_pool = jnp.zeros((P, NH, HS, ps))
    v_pool = jnp.zeros((P, NH, HS, ps))
    rows = jnp.ones((2, NH, HS))
    k2, v2 = write_layer_kv(k_pool, v_pool, rows, rows,
                            page2.ravel(), slot2.ravel())
    assert float(jnp.sum(k2)) == 0.0  # dropped, page 0 not corrupted


@pytest.fixture(scope="module")
def golden(fixtures_dir):
    cfg, params_np = formats.read_checkpoint(
        os.path.join(fixtures_dir, "model_tiny.bin"))
    state = formats.read_debug_state(
        os.path.join(fixtures_dir, "state_tiny.bin"), cfg)
    return cfg, gpt2.to_device(params_np, cfg), state


@pytest.mark.parametrize("use_kernel", [True, False])
def test_paged_model_matches_dense_model(golden, use_kernel):
    """End-to-end: paged prefill+decode logits == no-cache forward logits,
    with sequences scattered over a shuffled page pool by the real
    BlockManager (the reference never tests this chain end-to-end —
    SURVEY.md §4 gaps)."""
    cfg, params, state = golden
    page_cfg = PageConfig(page_size=8, num_pages=32, max_seqs=4,
                          pages_per_seq=4)
    x = state["x"][:2, :20]  # 2 sequences, 20 tokens
    B, T = x.shape
    full = np.asarray(gpt2.forward(params, jnp.asarray(x), cfg))

    mgr = BlockManager(page_cfg.num_pages, page_cfg.page_size,
                       page_cfg.max_seqs)
    # fragment the pool: scatter some pages to another prompt first
    mgr.append_tokens(3, 9)
    pool = init_pool(cfg, page_cfg)

    split = 11
    for b in range(B):
        segs, ev = mgr.append_tokens(b, split)
        assert ev == []
    tables = np.stack([mgr.block_table_array(b, page_cfg.pages_per_seq)
                       for b in range(B)])
    pos = np.tile(np.arange(T), (B, 1)).astype(np.int32)
    page, slot = token_coords(jnp.asarray(tables),
                              jnp.asarray(pos[:, :split]), page_cfg.page_size,
                              jnp.ones((B, split), bool), page_cfg.num_pages)
    logits_pre, pool = gpt2_paged.prefill_paged(
        params, jnp.asarray(x[:, :split]), page, slot, pool, cfg)
    np.testing.assert_allclose(np.asarray(logits_pre), full[:, :split],
                               rtol=1e-4, atol=1e-5)

    for t in range(split, T):
        for b in range(B):
            segs, ev = mgr.append_tokens(b, 1)
            assert len(segs) == 1 and ev == []
        tables = np.stack([mgr.block_table_array(b, page_cfg.pages_per_seq)
                           for b in range(B)])
        seg_page = np.array([mgr.block_table(b)[t // page_cfg.page_size]
                             for b in range(B)], dtype=np.int32)
        seg_slot = np.full((B,), t % page_cfg.page_size, dtype=np.int32)
        lengths = jnp.full((B,), t + 1, dtype=jnp.int32)
        logits_t, pool = gpt2_paged.decode_step_paged(
            params, jnp.asarray(x[:, t]), jnp.full((B,), t, jnp.int32),
            jnp.asarray(seg_page), jnp.asarray(seg_slot),
            jnp.asarray(tables), lengths, pool, cfg, use_kernel=use_kernel)
        np.testing.assert_allclose(np.asarray(logits_t), full[:, t],
                                   rtol=1e-4, atol=1e-5, err_msg=str(t))


def test_full_pool_kernel_matches_single_layer():
    """The full-pool kernel (layer plane selected by scalar prefetch) must
    equal the single-layer kernel on every layer of a multi-layer pool."""
    from llmc_paged_tpu.ops.dev.lab_full_pool import (
        paged_decode_attention_full, paged_decode_attention_full_xla)

    rng = np.random.default_rng(3)
    Lk, B, NH, HS, P, ps, pps = 3, 2, 4, 64, 12, 8, 4
    q = jnp.asarray(rng.standard_normal((B, NH, HS), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((Lk, P, NH, HS, ps), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((Lk, P, NH, HS, ps), dtype=np.float32))
    tables = jnp.asarray(
        rng.permutation(P)[: B * pps].reshape(B, pps).astype(np.int32))
    lengths = jnp.asarray([29, 7], jnp.int32)
    starts = jnp.asarray([4, 0], jnp.int32)
    for layer in range(Lk):
        ref = paged_decode_attention(q, k[layer], v[layer], tables, lengths,
                                     starts, interpret=INTERP)
        got = paged_decode_attention_full(q, k, v, jnp.int32(layer), tables,
                                          lengths, starts, interpret=INTERP)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)
        oracle = paged_decode_attention_full_xla(q, k, v, layer, tables,
                                                 lengths, starts)
        np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                                   atol=2e-5)


def test_full_pool_quant_kernel_matches_oracle():
    from llmc_paged_tpu.kv.layouts import quantize_pages
    from llmc_paged_tpu.ops.dev.lab_full_pool import (
        paged_decode_attention_quant_full,
        paged_decode_attention_quant_full_xla)

    rng = np.random.default_rng(5)
    Lk, B, NH, HS, P, ps, pps = 2, 2, 4, 64, 10, 8, 4
    q = jnp.asarray(rng.standard_normal((B, NH, HS), dtype=np.float32))
    kf = rng.standard_normal((Lk, P, NH, HS, ps)).astype(np.float32)
    vf = rng.standard_normal((Lk, P, NH, HS, ps)).astype(np.float32)
    kq, ks = quantize_pages(jnp.asarray(kf))  # (L,P,NH,HS,ps), (L,P,NH,ps)
    vq, vs = quantize_pages(jnp.asarray(vf))
    tables = jnp.asarray(
        rng.permutation(P)[: B * pps].reshape(B, pps).astype(np.int32))
    lengths = jnp.asarray([25, 12], jnp.int32)
    for layer in range(Lk):
        got = paged_decode_attention_quant_full(
            q, kq, vq, ks, vs, jnp.int32(layer), tables, lengths,
            interpret=INTERP)
        oracle = paged_decode_attention_quant_full_xla(
            q, kq, vq, ks, vs, layer, tables, lengths)
        np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                                   atol=2e-5)


def test_write_kv_full_matches_per_layer():
    from llmc_paged_tpu.kv.layouts import PagePool, write_layer_kv
    from llmc_paged_tpu.ops.dev.lab_full_pool import write_kv_full

    rng = np.random.default_rng(9)
    Lk, NH, P, ps, HS, N = 3, 2, 6, 4, 8, 5
    pool = PagePool(jnp.zeros((Lk, P, NH, HS, ps)),
                    jnp.zeros((Lk, P, NH, HS, ps)))
    k_new = jnp.asarray(rng.standard_normal((N, NH, HS), dtype=np.float32))
    v_new = jnp.asarray(rng.standard_normal((N, NH, HS), dtype=np.float32))
    page = jnp.asarray([0, 0, 3, 5, 6], jnp.int32)   # last row: dropped
    slot = jnp.asarray([0, 1, 2, 3, 0], jnp.int32)
    for layer in range(Lk):
        got = write_kv_full(pool, jnp.int32(layer), k_new, v_new, page, slot)
        ref_k, ref_v = write_layer_kv(pool.k[layer], pool.v[layer],
                                      k_new, v_new, page, slot)
        np.testing.assert_array_equal(np.asarray(got.k[layer]),
                                      np.asarray(ref_k))
        np.testing.assert_array_equal(np.asarray(got.v[layer]),
                                      np.asarray(ref_v))
        # other layers untouched
        for other in range(Lk):
            if other != layer:
                assert not np.asarray(got.k[other]).any()


def test_fully_masked_page_yields_zero_parts():
    """start >= length (in-contract: the chunk path passes starts =
    pos+1-window which can exceed lengths_pool when an in-chunk step
    slides past the whole pool prefix): the parts must report l = 0 /
    acc = 0 — NOT exp(NEG_INF - NEG_INF) = 1 claiming the whole page's
    mass — exactly like the XLA oracle, for every kernel variant."""
    from llmc_paged_tpu.kv.layouts import quantize_pages
    from llmc_paged_tpu.ops.paged_attention import (
        paged_decode_attention_parts, paged_decode_attention_parts_xla,
        paged_decode_attention_parts_mq, paged_decode_attention_parts_mq_xla,
        paged_decode_attention_quant_parts,
        paged_decode_attention_quant_parts_xla)

    ps, P, pps = 128, 14, 4
    q, k, v, tables, rng = rand_case(P=P, ps=ps, pps=pps)
    # row 0: start beyond length INSIDE the last live page (the defect
    # case); row 1: start == length exactly; row 2: healthy window
    lengths = jnp.asarray(np.array([5, ps + 3, 3 * ps], np.int32))
    starts = jnp.asarray(np.array([7, ps + 3, ps], np.int32))

    for impl, oracle, args in (
        (paged_decode_attention_parts, paged_decode_attention_parts_xla,
         (q, k, v, tables, lengths, starts)),
    ):
        got = impl(*args, interpret=INTERP)
        ref = oracle(*args)
        for g, r, name in zip(got, ref, ("acc", "m", "l")):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=name)
        # the contract itself: masked-out rows carry ZERO mass
        assert float(np.asarray(got[2])[0].max()) == 0.0
        assert float(np.abs(np.asarray(got[0])[0]).max()) == 0.0

    kq, ks = quantize_pages(k)
    vq, vs = quantize_pages(v)
    gotq = paged_decode_attention_quant_parts(
        q, kq, vq, ks, vs, tables, lengths, starts, interpret=INTERP)
    refq = paged_decode_attention_quant_parts_xla(
        q, kq, vq, ks, vs, tables, lengths, starts)
    for g, r, name in zip(gotq, refq, ("acc", "m", "l")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=2e-5, err_msg=name)
    assert float(np.asarray(gotq[2])[0].max()) == 0.0

    # multi-query variant (spec verify / suffix prefill path)
    qmq = jnp.asarray(rng.standard_normal((3, 2, 4, 64), dtype=np.float32))
    gmq = paged_decode_attention_parts_mq(qmq, k, v, tables, lengths,
                                          starts, interpret=INTERP)
    rmq = paged_decode_attention_parts_mq_xla(qmq, k, v, tables, lengths,
                                              starts)
    for g, r, name in zip(gmq, rmq, ("acc", "m", "l")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-5, err_msg=name)
    assert float(np.asarray(gmq[2])[0].max()) == 0.0


def test_fully_masked_page_grid_kernel_normalized():
    """Same defect case through the ps<128 GRID kernels' normalized
    wrappers: a start >= length row must return zeros, not the mean of
    garbage V rows."""
    from llmc_paged_tpu.kv.layouts import quantize_pages
    from llmc_paged_tpu.ops.paged_attention import (
        paged_decode_attention_grid, paged_decode_attention_quant_grid)

    ps, P = 8, 16
    q, k, v, tables, _ = rand_case(P=P, ps=ps)
    lengths = jnp.asarray(np.array([5, 2 * ps + 1, 4 * ps], np.int32))
    starts = jnp.asarray(np.array([7, 0, 2 * ps], np.int32))
    out = np.asarray(paged_decode_attention_grid(
        q, k, v, tables, lengths, starts, interpret=INTERP))
    ref = np.asarray(paged_decode_attention_xla(
        q, k, v, tables, lengths, starts))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    assert np.abs(out[0]).max() == 0.0
    kq, ks = quantize_pages(k)
    vq, vs = quantize_pages(v)
    outq = np.asarray(paged_decode_attention_quant_grid(
        q, kq, vq, ks, vs, tables, lengths, starts, interpret=INTERP))
    assert np.abs(outq[0]).max() == 0.0


def _grouped_chunk_coords(rng, K, B, ps, num_pages, mode):
    """Host-built (K, B) chunk coordinates honoring the allocator
    contract commit_layer_kv relies on: down each column, slots fill a
    page monotonically before moving to a (random) fresh page; optional
    trailing/whole drop-sentinel runs. Returns (pages, slots)."""
    pages = np.full((K, B), num_pages, np.int32)
    slots = np.zeros((K, B), np.int32)
    free = list(rng.permutation(num_pages))
    for b in range(B):
        if mode == "inactive" and b == 0:
            slots[:, b] = 0                      # whole-column sentinel
            continue
        n = K if mode != "spec_tail" else int(rng.integers(0, K + 1))
        off = int(rng.integers(0, ps))           # mid-page start
        page = free.pop()
        for j in range(n):
            if off == ps:
                page, off = free.pop(), 0
            pages[j, b], slots[j, b] = page, off
            off += 1
        slots[n:, b] = np.arange(K - n) % ps     # stale writes, dropped
    return pages, slots


@pytest.mark.parametrize("mode", ["full", "inactive", "spec_tail"])
@pytest.mark.parametrize("quant", [False, True])
def test_commit_layer_kv_matches_scatter(mode, quant):
    """The page-granular chunk commit (gather + one-hot blend + page
    scatter — the layout-neutral path) must land BIT-IDENTICAL pool
    contents to flattening the tails through the per-token scatter
    (write_layer_kv), including mid-page starts, page spans, inactive
    sentinel columns, and speculative sentinel tails."""
    from llmc_paged_tpu.kv.layouts import (commit_layer_kv,
                                           commit_layer_kv_quant,
                                           write_layer_kv_quant)

    K, B, NH, HS, ps, P = 12, 4, 3, 8, 8, 10
    rng = np.random.default_rng(hash(mode) % 2**31)
    pages, slots = _grouped_chunk_coords(rng, K, B, ps, P, mode)
    tails_k = jnp.asarray(rng.standard_normal((K, B, NH, HS)), jnp.float32)
    tails_v = jnp.asarray(rng.standard_normal((K, B, NH, HS)), jnp.float32)
    pool0 = init_pool(GPT2Config.tiny(num_layers=1, num_heads=NH,
                                      channels=NH * HS),
                      PageConfig(page_size=ps, num_pages=P, max_seqs=B,
                                 pages_per_seq=4),
                      dtype="int8" if quant else jnp.float32)
    # pre-fill the pool with junk so untouched slots must pass through
    junk = jax.tree.map(
        lambda a: jnp.asarray(
            rng.integers(-5, 5, a.shape).astype(a.dtype))
        if a.dtype == jnp.int8
        else jnp.asarray(rng.standard_normal(a.shape), a.dtype), pool0)
    pg, sl = jnp.asarray(pages), jnp.asarray(slots)
    fk = tails_k.reshape(K * B, NH, HS)
    fv = tails_v.reshape(K * B, NH, HS)
    fp, fs = pg.reshape(K * B), sl.reshape(K * B)
    if quant:
        got = commit_layer_kv_quant(junk.layer(0), tails_k, tails_v,
                                    pg, sl)
        want = write_layer_kv_quant(junk.layer(0), fk, fv, fp, fs)
    else:
        got = commit_layer_kv(*junk.layer(0), tails_k, tails_v, pg, sl)
        want = write_layer_kv(*junk.layer(0), fk, fv, fp, fs)
    for g, w, name in zip(got, want, ("k", "v", "ks", "vs")):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                      err_msg=f"{mode} {name}")
