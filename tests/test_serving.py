"""Asynchronous continuous-serving tests (engine/server.ServingEngine +
InferenceEngine.run's feed/on_finish protocol).

Contract: requests submitted WHILE OTHERS RUN join the running batch at
the next admission wave and produce exactly the tokens a batch run would
(greedy determinism makes this checkable); a short late request must not
wait for an earlier long one to finish (continuous batching, not batch
boundaries). No reference analogue: its mains decode a fixed prompt set.
"""

import threading
import time

import numpy as np
import pytest

import jax

from llmc_paged_tpu.config import EngineConfig, GPT2Config, PageConfig
from llmc_paged_tpu.engine.engine import InferenceEngine
from llmc_paged_tpu.engine.scheduler import Request
from llmc_paged_tpu.engine.server import ServingEngine
from llmc_paged_tpu.models import gpt2


def _setup(seed=0, **page_kw):
    cfg = GPT2Config.tiny(max_seq_len=128, vocab_size=128, num_layers=2,
                          num_heads=4, channels=32)
    params = jax.tree.map(
        np.asarray, gpt2.init_params(cfg, jax.random.PRNGKey(seed)))
    kw = dict(page_size=8, num_pages=48, max_seqs=8, pages_per_seq=10)
    kw.update(page_kw)
    page = PageConfig(**kw)
    return cfg, params, page


def _prompts(n, lo=3, hi=12, seed=7):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 128, int(ln)).tolist()
            for ln in rng.integers(lo, hi, n)]


def test_serving_matches_batch_run():
    """Staggered submissions produce exactly the tokens of one batch run."""
    cfg, params, page = _setup()
    prompts = _prompts(8)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=3, decode_chunk=4)

    batch_eng = InferenceEngine(params, cfg, econf)
    done = batch_eng.run([Request(rid=i, prompt=list(p), max_new_tokens=9)
                          for i, p in enumerate(prompts)])
    expect = {r.rid: r.tokens for r in done}

    srv_eng = InferenceEngine(params, cfg, econf)
    with ServingEngine(srv_eng) as srv:
        futs = {}
        for i, p in enumerate(prompts):
            futs[i] = srv.submit(p, 9, rid=i)
            if i % 3 == 2:
                time.sleep(0.05)           # arrive while others decode
        got = {i: f.result(timeout=120) for i, f in futs.items()}
    assert got == expect


def test_serving_late_short_request_overtakes_long():
    """A short request submitted AFTER a long one started must finish
    first — it joins the running batch instead of waiting for a batch
    boundary (the defining continuous-batching property)."""
    cfg, params, page = _setup()
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=4, decode_chunk=2)
    eng = InferenceEngine(params, cfg, econf)
    order = []
    with ServingEngine(eng) as srv:
        long_fut = srv.submit(_prompts(1)[0], 60)
        long_fut.add_done_callback(lambda f: order.append("long"))
        time.sleep(0.8)                     # long one is mid-decode
        short_fut = srv.submit(_prompts(1, seed=9)[0], 2)
        short_fut.add_done_callback(lambda f: order.append("short"))
        assert len(short_fut.result(timeout=120)) > 0
        long_fut.result(timeout=120)
    assert order and order[0] == "short", order


def test_serving_submission_validation_fails_future_only():
    """An impossible request fails ITS future at submit(); the loop keeps
    serving everything else."""
    cfg, params, page = _setup()
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=2, decode_chunk=4)
    eng = InferenceEngine(params, cfg, econf)
    with ServingEngine(eng) as srv:
        bad = srv.submit(list(range(60)), 10_000)   # > max_context
        with pytest.raises(ValueError, match="max_context"):
            bad.result(timeout=10)
        ok = srv.submit(_prompts(1)[0], 5)
        assert len(ok.result(timeout=120)) > 0


def test_serving_close_semantics():
    cfg, params, page = _setup()
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=2, decode_chunk=4)
    eng = InferenceEngine(params, cfg, econf)
    srv = ServingEngine(eng)
    futs = [srv.submit(p, 6) for p in _prompts(5)]
    srv.close()                             # drains everything submitted
    for f in futs:
        assert len(f.result(timeout=120)) > 0
    with pytest.raises(RuntimeError, match="closed"):
        srv.submit([1, 2, 3], 4)


def test_serving_with_prefix_cache_and_spec():
    """The serving loop composes with prefix caching + speculative decode;
    repeated system prompts hit the cache across asynchronous arrivals."""
    cfg, params, page = _setup(page_size=8, num_pages=64, max_seqs=8,
                               pages_per_seq=12, prefix_cache=True)
    rng = np.random.default_rng(3)
    sysp = rng.integers(0, 128, 24).tolist()
    prompts = [sysp + rng.integers(0, 128, int(n)).tolist()
               for n in (4, 7, 5, 6, 8, 3)]
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=3, decode_chunk=4, spec_k=3)

    batch_eng = InferenceEngine(params, cfg, econf)
    done = batch_eng.run([Request(rid=i, prompt=list(p), max_new_tokens=8)
                          for i, p in enumerate(prompts)])
    expect = {r.rid: r.tokens for r in done}

    eng = InferenceEngine(params, cfg, econf)
    with ServingEngine(eng) as srv:
        futs = {}
        for i, p in enumerate(prompts):
            futs[i] = srv.submit(p, 8, rid=i)
            time.sleep(0.03)
        got = {i: f.result(timeout=120) for i, f in futs.items()}
    assert got == expect
    assert eng.stats["prefix_hit_pages"] > 0


def test_serving_stream_tokens():
    """submit_stream yields token batches that concatenate to exactly the
    batch-run stream, in MULTIPLE flushes (stream_links bounds the chain),
    interleaved with a concurrent non-stream request."""
    cfg, params, page = _setup()
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=4, decode_chunk=2, stream_links=2)
    prompts = _prompts(2)
    eng_b = InferenceEngine(params, cfg, econf)
    done = eng_b.run([Request(rid=i, prompt=list(p), max_new_tokens=24)
                      for i, p in enumerate(prompts)])
    expect = {r.rid: r.tokens for r in done}

    eng = InferenceEngine(params, cfg, econf)
    with ServingEngine(eng) as srv:
        it = srv.submit_stream(prompts[0], 24, rid=0)
        fut = srv.submit(prompts[1], 24, rid=1)
        batches = list(it)
        got = list(prompts[0]) + [t for b in batches for t in b]
        assert got == expect[0]
        assert len(batches) >= 3, batches   # bounded chains -> many flushes
        assert fut.result(timeout=120) == expect[1]

    # invalid stream requests raise synchronously
    eng2 = InferenceEngine(params, cfg, econf)
    with ServingEngine(eng2) as srv:
        with pytest.raises(ValueError, match="max_context"):
            srv.submit_stream(list(range(60)), 10_000)


def test_serving_backpressure_max_pending():
    """max_pending bounds LIVE requests: the excess submission raises
    QueueFull immediately; capacity frees as requests finish."""
    from llmc_paged_tpu.engine.server import QueueFull

    cfg, params, page = _setup()
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=2, decode_chunk=4)
    eng = InferenceEngine(params, cfg, econf)
    with ServingEngine(eng, max_pending=2) as srv:
        futs = [srv.submit(p, 30) for p in _prompts(2)]
        with pytest.raises(QueueFull, match="max_pending"):
            srv.submit(_prompts(1, seed=3)[0], 5)
        for f in futs:
            assert len(f.result(timeout=300)) > 0
        ok = srv.submit(_prompts(1, seed=4)[0], 5)   # capacity freed
        assert len(ok.result(timeout=120)) > 0


def test_ttft_includes_queue_time():
    """t_submit stamped at enqueue survives Scheduler.submit — TTFT for a
    served request includes the time it queued before admission."""
    from llmc_paged_tpu.engine.scheduler import Scheduler

    sched = Scheduler(max_batch=2)
    early = time.monotonic() - 5.0
    r = Request(rid=0, prompt=[1], max_new_tokens=1)
    r.t_submit = early                      # serving front stamps arrival
    sched.submit(r)
    assert r.t_submit == early              # preserved, not overwritten
    r2 = Request(rid=1, prompt=[1], max_new_tokens=1)
    sched.submit(r2)
    assert r2.t_submit > early              # batch path still stamps
