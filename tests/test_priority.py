"""Admission-priority tests (Request.priority): strict priority, FIFO
within a class; preempted requests keep front-of-class seniority. The
reference admits FIFO only (one fixed prompt set); priority is serving
policy surface on top of the same scheduler.
"""

import time

import numpy as np

import jax

from llmc_paged_tpu.config import EngineConfig, GPT2Config, PageConfig
from llmc_paged_tpu.engine.engine import InferenceEngine
from llmc_paged_tpu.engine.scheduler import Request, Scheduler
from llmc_paged_tpu.engine.server import ServingEngine
from llmc_paged_tpu.models import gpt2


def test_scheduler_pop_order():
    s = Scheduler(max_batch=1)
    for rid, pr in enumerate([0, 0, 5, 0, 1]):
        s.submit(Request(rid=rid, prompt=[1], max_new_tokens=1,
                         priority=pr))
    order = [s.pop_next_waiting().rid for _ in range(5)]
    assert order == [2, 4, 0, 1, 3]
    # preempted request re-queued at the front of its class
    s.submit(Request(rid=10, prompt=[1], max_new_tokens=1, priority=1))
    s.admit(Request(rid=11, prompt=[1], max_new_tokens=1, priority=1), 0)
    s.preempt(0)
    assert [s.pop_next_waiting().rid for _ in range(2)] == [11, 10]


def test_engine_finishes_by_priority():
    """max_batch=1: finish order follows priority class, FIFO within."""
    cfg = GPT2Config.tiny(max_seq_len=128, vocab_size=128, num_layers=2,
                          num_heads=4, channels=32)
    params = jax.tree.map(
        np.asarray, gpt2.init_params(cfg, jax.random.PRNGKey(0)))
    page = PageConfig(page_size=8, num_pages=48, max_seqs=8,
                      pages_per_seq=10)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=1, decode_chunk=4)
    eng = InferenceEngine(params, cfg, econf)
    rng = np.random.default_rng(5)
    order = []
    reqs = [Request(rid=i, prompt=rng.integers(0, 128, 6).tolist(),
                    max_new_tokens=4, priority=pr)
            for i, pr in enumerate([0, 0, 5, 0, 1])]
    eng.run(reqs, on_finish=lambda r: order.append(r.rid))
    assert order == [2, 4, 0, 1, 3]


def test_serving_high_priority_overtakes_queue():
    """With the single slot busy and two queued requests, the later
    HIGH-priority one admits first when the slot frees."""
    cfg = GPT2Config.tiny(max_seq_len=128, vocab_size=128, num_layers=2,
                          num_heads=4, channels=32)
    params = jax.tree.map(
        np.asarray, gpt2.init_params(cfg, jax.random.PRNGKey(0)))
    page = PageConfig(page_size=8, num_pages=48, max_seqs=8,
                      pages_per_seq=10)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=1, decode_chunk=2)
    eng = InferenceEngine(params, cfg, econf)
    rng = np.random.default_rng(6)
    order = []
    with ServingEngine(eng) as srv:
        first = srv.submit(rng.integers(0, 128, 6).tolist(), 60)
        # wait for admission (not a fixed sleep — the tiny model can
        # finish a short budget faster than a sleep on a fast machine),
        # then enqueue both contenders immediately
        deadline = time.monotonic() + 120
        while (eng.live_stats.get("running", 0) < 1
               and time.monotonic() < deadline):
            time.sleep(0.005)
        low = srv.submit(rng.integers(0, 128, 6).tolist(), 4)
        low.add_done_callback(lambda f: order.append("low"))
        high = srv.submit(rng.integers(0, 128, 6).tolist(), 4, priority=3)
        high.add_done_callback(lambda f: order.append("high"))
        for f in (first, low, high):
            f.result(timeout=300)
    assert order[0] == "high", order
