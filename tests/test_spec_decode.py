"""Speculative decode tests.

The contract is EXACTNESS: greedy speculation (device n-gram drafting +
multi-query verification, models/gpt2_paged.decode_chunk_spec) must emit
the identical token stream as plain greedy decode — acceptance only
changes how many tokens each device step yields. (No reference analogue;
the quality bar is the same one the chunked decode path already meets:
token equality with single-token stepping up to fp associativity.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmc_paged_tpu.config import GPT2Config, PageConfig
from llmc_paged_tpu.kv.layouts import init_pool, token_coords
from llmc_paged_tpu.kv.manager import BlockManager
from llmc_paged_tpu.models import gpt2, gpt2_paged


def _setup(ps, num_pages, kv_dtype="float32", seed=0, vocab=64):
    cfg = GPT2Config.tiny(max_seq_len=512, vocab_size=vocab, num_layers=2,
                          num_heads=4, channels=64)
    params = gpt2.to_device(
        jax.tree.map(np.asarray, gpt2.init_params(cfg, jax.random.PRNGKey(seed))),
        cfg)
    page_cfg = PageConfig(page_size=ps, num_pages=num_pages, max_seqs=4,
                          pages_per_seq=-(-cfg.max_seq_len // ps),
                          kv_dtype=kv_dtype)
    return cfg, params, page_cfg


def _prefill(params, cfg, page_cfg, mgr, prompts):
    """Batched prefill through the real manager; returns (pool, first
    greedy token per row, block tables)."""
    B = len(prompts)
    T = max(len(p) for p in prompts)
    assert all(len(p) == T for p in prompts), "test keeps prompts equal"
    pool = init_pool(cfg, page_cfg, dtype=page_cfg.kv_dtype)
    for b in range(B):
        segs, ev = mgr.append_tokens(b, T)
        assert segs and ev == []
    tables = np.stack([mgr.block_table_array(b, page_cfg.pages_per_seq)
                       for b in range(B)])
    x = np.asarray(prompts, np.int32)
    pos = np.tile(np.arange(T, dtype=np.int32), (B, 1))
    pg, sl = token_coords(jnp.asarray(tables), jnp.asarray(pos),
                          page_cfg.page_size, jnp.ones((B, T), bool),
                          page_cfg.num_pages)
    logits, pool = gpt2_paged.prefill_paged(params, jnp.asarray(x), pg, sl,
                                            pool, cfg)
    first = np.asarray(jnp.argmax(logits[:, -1], axis=-1), np.int32)
    return pool, first, tables


def _greedy_steps(params, cfg, page_cfg, mgr, pool, toks, n_new,
                  use_kernel=True):
    """Oracle: n_new single-token greedy steps through decode_step_paged."""
    B = len(toks)
    out = [[] for _ in range(B)]
    for _ in range(n_new):
        pg = np.zeros(B, np.int32)
        sl = np.zeros(B, np.int32)
        lengths = np.zeros(B, np.int32)
        for b in range(B):
            segs, ev = mgr.append_tokens(b, 1)
            assert len(segs) == 1 and ev == []
            pg[b], sl[b] = segs[0].page, segs[0].offset
            lengths[b] = mgr.seq_len(b)
        tables = np.stack([mgr.block_table_array(b, page_cfg.pages_per_seq)
                           for b in range(B)])
        positions = jnp.asarray(lengths - 1)
        logits, pool = gpt2_paged.decode_step_paged(
            params, jnp.asarray(np.asarray([t[-1] for t in toks], np.int32)),
            positions, jnp.asarray(pg), jnp.asarray(sl), jnp.asarray(tables),
            jnp.asarray(lengths), pool, cfg, use_kernel=use_kernel)
        picks = np.asarray(jnp.argmax(logits, axis=-1), np.int32)
        for b in range(B):
            toks[b].append(int(picks[b]))
            out[b].append(int(picks[b]))
    return out, pool, toks


def _run_spec_chain(params, cfg, page_cfg, mgr, pool, toks, n_links, S, K,
                    ngram=3, use_kernel=True, active=None):
    """n_links speculative chunks with device-carried state, pessimistic
    reservation + truncate_to rollback — the engine's pattern."""
    B = len(toks)
    active = [True] * B if active is None else active
    hist = np.zeros((B, page_cfg.max_context + 1), np.int32)
    for b in range(B):
        hist[b, :len(toks[b])] = toks[b]
    hist_d = jnp.asarray(hist)
    first = jnp.asarray(np.asarray([t[-1] for t in toks], np.int32))
    positions0 = jnp.asarray(np.asarray(
        [len(toks[b]) - 1 if active[b] else -1 for b in range(B)], np.int32))
    out = [[] for _ in range(B)]
    total_acc = 0
    for _ in range(n_links):
        for b in range(B):
            if active[b]:
                segs, ev = mgr.append_tokens(b, S * K)
                assert segs and ev == []
        tables = np.stack([mgr.block_table_array(b, page_cfg.pages_per_seq)
                           for b in range(B)])
        o, counts, hist_d, first, positions0, pool = \
            gpt2_paged.decode_chunk_spec(
                params, first, positions0, hist_d, pool,
                jnp.asarray(tables), cfg, num_steps=S, spec_k=K,
                ngram=ngram, use_kernel=use_kernel)
        o = np.asarray(o)              # (S, K, B)
        counts = np.asarray(counts)    # (S, B)
        for b in range(B):
            if not active[b]:
                assert counts[:, b].sum() == 0
                continue
            for s in range(S):
                out[b].extend(int(t) for t in o[s, :counts[s, b], b])
            mgr.truncate_to(b, len(toks[b]) + len(out[b]))
            total_acc += int(counts[:, b].sum())
    return out, pool, positions0, total_acc


@pytest.mark.parametrize("use_kernel,ps,num_pages",
                         [(True, 128, 10), (False, 16, 40)])
def test_spec_equals_greedy(use_kernel, ps, num_pages):
    """Speculative chunks emit exactly the greedy token stream, across
    chained links, for both the mq kernel path and the XLA oracle path.
    vocab=32 + a repetitive prompt makes random-param greedy generation
    loop, so drafting actually accepts (asserted) — and the committed
    pool K/V must let a later plain step continue identically."""
    cfg, params, page_cfg = _setup(ps, num_pages, vocab=32)
    B, S, K = 2, 4, 4
    prompts = [([3, 9, 4, 9, 3, 9, 4, 9] * 2)[:12],
               list(np.random.default_rng(5).integers(0, 32, 12))]

    # oracle: plain greedy stepping
    mgr_a = BlockManager(page_cfg.num_pages, page_cfg.page_size, 4)
    pool_a, first_a, _ = _prefill(params, cfg, page_cfg, mgr_a, prompts)
    toks_a = [list(p) + [int(first_a[b])] for b, p in enumerate(prompts)]
    n_links = 2
    ora, pool_a, toks_a = _greedy_steps(params, cfg, page_cfg, mgr_a, pool_a,
                                        toks_a, n_links * S * K,
                                        use_kernel=use_kernel)

    # speculative chain
    mgr_b = BlockManager(page_cfg.num_pages, page_cfg.page_size, 4)
    pool_b, first_b, _ = _prefill(params, cfg, page_cfg, mgr_b, prompts)
    np.testing.assert_array_equal(first_a, first_b)
    toks_b = [list(p) + [int(first_b[b])] for b, p in enumerate(prompts)]
    spec, pool_b, positions0, total_acc = _run_spec_chain(
        params, cfg, page_cfg, mgr_b, pool_b, toks_b, n_links, S, K,
        use_kernel=use_kernel)

    for b in range(B):
        n = len(spec[b])
        assert S * n_links <= n <= S * K * n_links
        assert spec[b] == ora[b][:n], f"row {b} diverged from greedy"
    assert total_acc > S * n_links * B, \
        "drafting never accepted — the speculative path wasn't exercised"

    # committed K/V check: one plain greedy step from the spec pool must
    # match the oracle stream's next token at the same position
    for b in range(B):
        toks_b[b].extend(spec[b])
    shortest = min(len(s) for s in spec)
    for b in range(B):
        mgr_b.truncate_to(b, len(prompts[b]) + 1 + shortest)
        toks_b[b] = toks_b[b][:len(prompts[b]) + 1 + shortest]
    nxt, pool_b, _ = _greedy_steps(params, cfg, page_cfg, mgr_b, pool_b,
                                   toks_b, 1, use_kernel=use_kernel)
    for b in range(B):
        assert nxt[b][0] == ora[b][shortest], \
            f"row {b}: committed K/V diverges from greedy cache"


def test_spec_inactive_rows_and_quant_pool():
    """Inactive rows (positions0 < 0) emit nothing and corrupt nothing;
    INT8 pools commit through the quantizing writer."""
    cfg, params, page_cfg = _setup(128, 10, kv_dtype="int8", vocab=32)
    B, S, K = 2, 3, 3
    prompts = [[1, 2, 3, 1, 2, 3, 1, 2], [4, 4, 5, 5, 4, 4, 5, 5]]

    mgr_a = BlockManager(page_cfg.num_pages, page_cfg.page_size, 4)
    pool_a, first_a, _ = _prefill(params, cfg, page_cfg, mgr_a, prompts)
    toks_a = [list(p) + [int(first_a[b])] for b, p in enumerate(prompts)]
    ora, _, _ = _greedy_steps(params, cfg, page_cfg, mgr_a, pool_a,
                              toks_a, S * K)

    mgr_b = BlockManager(page_cfg.num_pages, page_cfg.page_size, 4)
    pool_b, first_b, _ = _prefill(params, cfg, page_cfg, mgr_b, prompts)
    toks_b = [list(p) + [int(first_b[b])] for b, p in enumerate(prompts)]
    # row 1 inactive: its manager state must be untouched by the chunk
    len1 = mgr_b.seq_len(1)
    spec, _, _, _ = _run_spec_chain(params, cfg, page_cfg, mgr_b, pool_b,
                                    toks_b, 1, S, K, active=[True, False])
    n = len(spec[0])
    assert S <= n <= S * K and spec[0] == ora[0][:n]
    assert spec[1] == []
    assert mgr_b.seq_len(1) == len1


def test_ngram_draft_unit():
    """Drafting finds the MOST RECENT n-gram match and masks everything
    past the known tokens with -1."""
    from llmc_paged_tpu.models.gpt2_paged import _ngram_draft

    hist = jnp.asarray(np.array([
        [7, 8, 9, 1, 2, 7, 8, 5, 6, 7, 8, 0, 0],   # hl=11, tail [7,8]
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 1, 2, 0, 0],   # hl=11, tail [1,2]
        [3, 3, 3, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0],   # hl=4, tail [3,3]
        [1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],   # hl=2: too short
    ], np.int32))
    hl = jnp.asarray(np.array([11, 11, 4, 2], np.int32))
    d = np.asarray(_ngram_draft(hist, hl, n=2, d=3))
    # row 0: matches at j=0 ([7,8,9...]) and j=5 ([7,8,5...]); most recent
    # wins -> continuation [5, 6, 7]
    np.testing.assert_array_equal(d[0], [5, 6, 7])
    # row 1: match at j=0 -> [3, 4, 5]
    np.testing.assert_array_equal(d[1], [3, 4, 5])
    # row 2: [3,3] matches at j<=1; most recent j=1 -> continuation is
    # hist[3]=3 then past hl -> -1
    np.testing.assert_array_equal(d[2], [3, -1, -1])
    # row 3: hl < n+1 -> no draft
    np.testing.assert_array_equal(d[3], [-1, -1, -1])


def test_spec_no_starvation_without_reservation_headroom():
    """A row whose context cannot fit a full S*spec_k reservation can
    never join a spec plan; it must fall through to the adaptive chunk
    path in the SAME iterations instead of waiting for every other
    row's spec chain to finish. With max_context=32 and TK=6, row A
    (prompt 28, max_new 4) is spec-ineligible from the start; it must
    finish BEFORE row B's 24-token decode, and both streams must equal
    plain greedy."""
    from llmc_paged_tpu.config import EngineConfig
    from llmc_paged_tpu.engine.engine import InferenceEngine
    from llmc_paged_tpu.engine.scheduler import Request

    cfg = GPT2Config.tiny(max_seq_len=64, vocab_size=64, num_layers=2,
                          num_heads=4, channels=32)
    params = jax.tree.map(
        np.asarray, gpt2.init_params(cfg, jax.random.PRNGKey(0)))
    page = PageConfig(page_size=8, num_pages=16, max_seqs=2,
                      pages_per_seq=4)          # max_context 32
    rng = np.random.default_rng(3)
    prompt_a = rng.integers(0, 64, 28).tolist()
    prompt_b = rng.integers(0, 64, 6).tolist()

    def reqs():
        return [Request(rid=0, prompt=list(prompt_a), max_new_tokens=4),
                Request(rid=1, prompt=list(prompt_b), max_new_tokens=24)]

    plain = {r.rid: r.tokens for r in InferenceEngine(
        params, cfg, EngineConfig(cache_mode="paged", page=page,
                                  greedy=True, max_batch=2,
                                  decode_chunk=2)).run(reqs())}

    order = []
    eng = InferenceEngine(params, cfg, EngineConfig(
        cache_mode="paged", page=page, greedy=True, max_batch=2,
        decode_chunk=2, spec_k=3))
    done = {r.rid: r for r in eng.run(
        reqs(), on_finish=lambda r: order.append(r.rid))}
    assert done[0].tokens == plain[0] and done[1].tokens == plain[1]
    assert order[0] == 0, order     # A finished first, not starved
