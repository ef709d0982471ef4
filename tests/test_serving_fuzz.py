"""Randomized serving stress test: every feature at once, invariants
that must hold under ANY timing.

One greedy engine serves a randomized schedule — staggered arrivals,
mixed prompt lengths, per-request stop tokens, priorities, logprobs,
streams, and asynchronous cancels — over a pool small enough to force
preemptions. Because greedy decoding is deterministic and rows are
independent, every row's generated tokens must be a PREFIX of that
prompt's reference generation no matter how the schedule interleaved
(stops and cancels only truncate). The other invariants: every future
resolves exactly once; uncancelled rows end precisely at their first
stop id (or budget); stream flushes concatenate to the final tokens;
logprob lists stay aligned; and the pool drains back to empty.
"""

import random
import threading
import time
from concurrent.futures import CancelledError

import numpy as np
import pytest

import jax

from llmc_paged_tpu.config import EngineConfig, GPT2Config, PageConfig
from llmc_paged_tpu.engine.engine import InferenceEngine
from llmc_paged_tpu.engine.scheduler import Request
from llmc_paged_tpu.engine.server import ServingEngine
from llmc_paged_tpu.models import gpt2

N_REQS = 24
MAX_NEW = 18


@pytest.mark.parametrize("seed", [42, 7, 1234])
def test_serving_fuzz_invariants(seed):
    cfg = GPT2Config.tiny(max_seq_len=128, vocab_size=128, num_layers=2,
                          num_heads=4, channels=32)
    params = jax.tree.map(
        np.asarray, gpt2.init_params(cfg, jax.random.PRNGKey(0)))
    # pool deliberately tight: 3 slots, preemption-prone
    page = PageConfig(page_size=8, num_pages=14, max_seqs=3,
                      pages_per_seq=6)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=3, decode_chunk=4, stream_links=2)

    rng = np.random.default_rng(seed)
    pyrng = random.Random(seed)
    prompts = [rng.integers(0, 128, int(n)).tolist()
               for n in rng.integers(3, 14, N_REQS)]

    # reference: full-budget greedy generation per prompt (no stops)
    ref_eng = InferenceEngine(params, cfg, econf)
    ref = {}
    for start in range(0, N_REQS, 3):
        done = ref_eng.run([Request(rid=i, prompt=list(prompts[i]),
                                    max_new_tokens=MAX_NEW)
                            for i in range(start,
                                           min(start + 3, N_REQS))])
        ref.update({r.rid: r.generated for r in done})

    # randomized schedule
    plans = []
    for i in range(N_REQS):
        stop = None
        if pyrng.random() < 0.4:
            # a stop id that MAY appear: draw from the reference stream
            # half the time (guaranteed hit), random otherwise
            stop = [int(pyrng.choice(ref[i]))] if pyrng.random() < 0.5 \
                else [int(rng.integers(0, 128))]
        plans.append({
            "stop": stop,
            "priority": pyrng.choice([0, 0, 0, 1, 5]),
            "logprobs": pyrng.random() < 0.3,
            "stream": pyrng.random() < 0.3,
            # penalties / stochastic overrides change the row's OWN
            # stream (their invariant is length + neighbor stability,
            # not the greedy prefix), so they opt out of invariant 1/2
            "penalty": (round(pyrng.uniform(0.2, 1.0), 2)
                        if pyrng.random() < 0.2 else 0.0),
            "override": pyrng.random() < 0.15,   # greedy=False via temp
            "cancel_after_s": (pyrng.uniform(0.0, 0.8)
                               if pyrng.random() < 0.2 else None),
        })

    eng = InferenceEngine(params, cfg, econf)
    results = {}
    stream_batches = {}
    cancels = []
    with ServingEngine(eng) as srv:
        handles = {}
        stream_threads = []
        for i, plan in enumerate(plans):
            kw = dict(stop_tokens=plan["stop"],
                      priority=plan["priority"],
                      logprobs=plan["logprobs"],
                      frequency_penalty=plan["penalty"])
            if plan["override"]:
                kw.update(greedy=False, temperature=0.9, top_k=20)
            if plan["stream"]:
                h = srv.submit_stream(prompts[i], MAX_NEW, rid=i, **kw)
                stream_batches[i] = []

                def drain(h=h, i=i):
                    try:
                        for b in h:
                            stream_batches[i].append(list(b))
                        results[i] = ("ok", None)
                    except BaseException as e:   # pragma: no cover
                        results[i] = ("err", e)
                t = threading.Thread(target=drain)
                t.start()
                stream_threads.append(t)
                handles[i] = h
            else:
                handles[i] = srv.submit(prompts[i], MAX_NEW, rid=i, **kw)
            if plan["cancel_after_s"] is not None:
                def later(rid=i, delay=plan["cancel_after_s"]):
                    time.sleep(delay)
                    srv.cancel(rid)
                ct = threading.Thread(target=later)
                ct.start()
                cancels.append(ct)
            if pyrng.random() < 0.5:
                time.sleep(pyrng.uniform(0.0, 0.08))

        # collect
        reqs = {}
        for i, h in handles.items():
            if plans[i]["stream"]:
                reqs[i] = h.request
            else:
                try:
                    h.result(timeout=600)
                    results[i] = ("ok", None)
                except CancelledError:
                    results[i] = ("cancelled", None)
                reqs[i] = h.request
        for t in stream_threads:
            t.join(timeout=600)
            assert not t.is_alive()
        for t in cancels:
            t.join(timeout=60)

    # ---- invariants ----
    for i in range(N_REQS):
        r = reqs[i]
        gen = r.generated
        perturbed = plans[i]["penalty"] or plans[i]["override"]
        # 1) greedy prefix property under ANY truncation cause
        if not perturbed:
            assert gen == ref[i][: len(gen)], (i, gen, ref[i])
        # 2) uncancelled rows end exactly at the first stop id / budget
        if not r.cancelled and not perturbed:
            stop = plans[i]["stop"]
            hits = [k for k, t in enumerate(ref[i][:MAX_NEW])
                    if stop and t in stop]
            want = (hits[0] + 1) if hits else MAX_NEW
            assert len(gen) == want, (i, len(gen), want, stop)
        # 3) stream flushes concatenate to the final tokens
        if plans[i]["stream"]:
            flushed = [t for b in stream_batches[i] for t in b]
            assert flushed == gen[: len(flushed)]
            if not r.cancelled:
                assert flushed == gen
        # 4) logprobs stay aligned
        if plans[i]["logprobs"]:
            assert len(r.logprob_values) == len(gen)
            assert all(v <= 0.0 for v in r.logprob_values)
        # 5) every request resolved exactly once
        assert i in results and r.state.value == "done"

    # 6) the pool drained back to empty
    assert eng.live_stats["pages_free"] == page.num_pages
    assert eng.live_stats["running"] == 0 and \
        eng.live_stats["waiting"] == 0
    assert eng.live_stats["finished_total"] == N_REQS
