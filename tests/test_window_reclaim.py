"""Sliding-window page reclamation (SURVEY §5 long-context): a window-W
sequence must hold O(W/page_size) physical pages no matter how long it
generates, with tokens unchanged vs the mask-only window semantics.

The reference never reclaims (its `offset` only masks, paged_infer.c:165,
190) — a window-W sequence there consumes O(total_len) pages forever."""

import os

import numpy as np
import pytest

from llmc_paged_tpu import formats
from llmc_paged_tpu.config import EngineConfig, PageConfig
from llmc_paged_tpu.engine.engine import InferenceEngine
from llmc_paged_tpu.engine.scheduler import Request
from llmc_paged_tpu.kv.manager import BlockManager
from llmc_paged_tpu.kv.native import make_block_manager


@pytest.mark.parametrize("native", [False, True])
def test_release_below_frees_and_tombstones(native):
    mgr = make_block_manager(8, 4, 2, native=native)
    mgr.append_tokens(0, 14)               # pages 0..3, last filled 2
    assert mgr.num_free() == 4
    freed = mgr.release_below(0, 9)        # positions < 9 → pages 0,1 dead
    assert freed == 2
    assert mgr.num_free() == 6
    assert mgr.seq_len(0) == 14            # logical length unchanged
    assert mgr.block_table(0)[:2] == [-1, -1]
    # device row forward-fills tombstones with the next live page
    row = mgr.block_table_array(0, 6)
    assert row[0] == row[1] == row[2] == mgr.block_table(0)[2]
    # released twice is a no-op
    assert mgr.release_below(0, 9) == 0
    # freed pages are allocatable again (first-free scan finds them)
    segs, _ = mgr.append_tokens(1, 4)
    assert segs[0].page in (0, 1)
    # free_prompt with tombstones present must not touch other prompts
    mgr.free_prompt(0)
    assert mgr.block_table(0) == []
    assert mgr.seq_len(1) == 4


def test_python_and_native_release_agree():
    py = BlockManager(10, 4, 3)
    nat = make_block_manager(10, 4, 3, native=True)
    if isinstance(nat, BlockManager):
        pytest.skip("native manager unavailable")
    for mgr in (py, nat):
        mgr.append_tokens(0, 10)
        mgr.append_tokens(1, 6)
        mgr.append_tokens(0, 3)
    for start in (4, 8, 12):
        assert py.release_below(0, start) == nat.release_below(0, start)
        assert py.block_table(0) == nat.block_table(0)
        assert py.seq_len(0) == nat.seq_len(0)
        assert py.num_free() == nat.num_free()
        np.testing.assert_array_equal(py.block_table_array(0, 8),
                                      nat.block_table_array(0, 8))
    # releasing AT/beyond seq_len would tombstone the live tail page —
    # the next append would dereference pages[-1] (another sequence's
    # page) and scatter into it; both implementations must refuse
    for mgr in (py, nat):
        with pytest.raises(ValueError, match="tail page"):
            mgr.release_below(0, 13)


@pytest.fixture(scope="module")
def tiny(fixtures_dir):
    cfg, params = formats.read_checkpoint(
        os.path.join(fixtures_dir, "model_tiny.bin"))
    stream = formats.read_token_stream(
        os.path.join(fixtures_dir, "tokens_tiny.bin"))
    return cfg, params, stream


def test_window_sequence_holds_O_window_pages(tiny):
    """10x-window generation through a pool that only fits the window:
    without reclamation this config is unschedulable (66 tokens → 17 pages
    > 8); with it the run completes in <= window+chunk pages, zero
    preemptions, and the tokens equal the dense-mode window reference."""
    cfg, params, stream = tiny
    window = 8
    prompt = stream[:6].tolist()
    new = 60                                        # ~10x window
    page = PageConfig(page_size=4, num_pages=8, max_seqs=2,
                      pages_per_seq=18)             # table fits 72 tokens
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=1, decode_chunk=4)
    eng = InferenceEngine(params, cfg, econf)
    out = eng.run([Request(rid=0, prompt=prompt, max_new_tokens=new)],
                  window=window)[0].tokens
    assert len(out) == len(prompt) + new
    assert eng.stats["preemptions"] == 0
    # live pages stay O(window): ceil(window/ps)+1 straddle + chunk reserve
    assert eng.stats["peak_pages_used"] <= (window // 4 + 1
                                            + econf.decode_chunk // 4 + 1)

    # tokens must match the dense-cache window reference (cached_infer.c
    # semantics), which needs no paging at all
    dense = InferenceEngine(params, cfg,
                            EngineConfig(cache_mode="dense", greedy=True))
    expect = dense.generate(prompt, new, window=window)
    assert out == expect


def test_window_reclaim_with_concurrency(tiny):
    """Two window-bounded sequences share a pool sized for ~one absolute
    sequence; reclamation must keep both running without thrash and match
    the single-request streams."""
    cfg, params, stream = tiny
    window = 8
    prompts = [stream[:6].tolist(), stream[3:9].tolist()]
    page = PageConfig(page_size=4, num_pages=12, max_seqs=4,
                      pages_per_seq=16)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=2, decode_chunk=4)
    eng = InferenceEngine(params, cfg, econf)
    done = eng.run([Request(rid=i, prompt=p, max_new_tokens=40)
                    for i, p in enumerate(prompts)], window=window)
    outs = {r.rid: r.tokens for r in done}
    for i, p in enumerate(prompts):
        solo = InferenceEngine(params, cfg, econf)
        expect = solo.run([Request(rid=0, prompt=p, max_new_tokens=40)],
                          window=window)[0].tokens
        assert outs[i] == expect


def test_window_with_waiting_queue(tiny):
    """Window mode + a waiting queue: more requests than slots, pool
    sized so admission leans on release_below reclaiming slid-out pages.
    The chunk chain keeps its one-link bound in window mode (pages free
    WITHOUT any row finishing there), so waiting requests are admitted
    as reclamation frees pages, and every stream matches its solo run."""
    cfg, params, stream = tiny
    window = 8
    prompts = [stream[i: i + 6].tolist() for i in range(4)]
    page = PageConfig(page_size=4, num_pages=14, max_seqs=4,
                      pages_per_seq=16)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=2, decode_chunk=4)
    eng = InferenceEngine(params, cfg, econf)
    done = eng.run([Request(rid=i, prompt=p, max_new_tokens=30)
                    for i, p in enumerate(prompts)], window=window)
    assert len(done) == 4
    outs = {r.rid: r.tokens for r in done}
    for i, p in enumerate(prompts):
        solo = InferenceEngine(params, cfg, econf)
        expect = solo.run([Request(rid=0, prompt=p, max_new_tokens=30)],
                          window=window)[0].tokens
        assert outs[i] == expect, i
