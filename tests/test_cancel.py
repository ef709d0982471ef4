"""Request cancellation tests (Request.cancelled / ServingEngine.cancel).

Contract: a cancel lands at the engine's next host-side poll point —
iteration top for queued rows, chain materialization for running rows —
frees the slot and pages wholesale (same in-order-execution safety
argument as preemption), resolves the Future with CancelledError, and
ends the stream without delivering post-cancel tokens. Tokens streamed
before the cancel stay delivered and are a prefix of the greedy batch
stream. No reference analogue (its mains decode a fixed prompt set);
this is the L4 serving capability an HTTP client disconnect needs.
"""

import json
import socket
import time
from concurrent.futures import CancelledError

import numpy as np
import pytest

import jax

from llmc_paged_tpu.config import EngineConfig, GPT2Config, PageConfig
from llmc_paged_tpu.engine.engine import InferenceEngine
from llmc_paged_tpu.engine.http_server import HttpServingFront
from llmc_paged_tpu.engine.scheduler import Request, State
from llmc_paged_tpu.engine.server import ServingEngine
from llmc_paged_tpu.models import gpt2


def _setup(seed=0, **page_kw):
    cfg = GPT2Config.tiny(max_seq_len=512, vocab_size=128, num_layers=2,
                          num_heads=4, channels=32)
    params = jax.tree.map(
        np.asarray, gpt2.init_params(cfg, jax.random.PRNGKey(seed)))
    kw = dict(page_size=8, num_pages=80, max_seqs=8, pages_per_seq=40)
    kw.update(page_kw)
    return cfg, params, PageConfig(**kw)


def _prompts(n, lo=3, hi=12, seed=7):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 128, int(ln)).tolist()
            for ln in rng.integers(lo, hi, n)]


def test_cancel_running_stream_is_prefix_and_frees_slot():
    """Cancelling a mid-decode stream ends it promptly; what was streamed
    is a prefix of the batch-run greedy tokens, and the slot actually
    frees (a follow-up request on a 1-slot engine completes)."""
    cfg, params, page = _setup()
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=1, decode_chunk=2, stream_links=2)
    prompts = _prompts(2)
    ref = InferenceEngine(params, cfg, econf)
    full = {r.rid: r.tokens
            for r in ref.run([Request(rid=i, prompt=list(p),
                                      max_new_tokens=200)
                              for i, p in enumerate(prompts)])}

    eng = InferenceEngine(params, cfg, econf)
    with ServingEngine(eng) as srv:
        it = srv.submit_stream(prompts[0], 200, rid=0)
        got = list(next(it))                    # first flush arrived
        assert it.cancel() is True
        for batch in it:                        # drains to DONE
            got.extend(batch)
        assert 0 < len(got) < 200
        assert list(prompts[0]) + got == full[0][: len(prompts[0]) + len(got)]
        # the slot freed: a second request decodes to completion
        fut = srv.submit(prompts[1], 200, rid=1)
        assert fut.result(timeout=300) == full[1]


def test_cancel_queued_request():
    """A request cancelled while still WAITING (slot-blocked) raises
    CancelledError; the running request is unaffected."""
    cfg, params, page = _setup()
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=1, decode_chunk=2)
    prompts = _prompts(2)
    ref = InferenceEngine(params, cfg, econf)
    expect = ref.run([Request(rid=0, prompt=list(prompts[0]),
                              max_new_tokens=60)])[0].tokens

    eng = InferenceEngine(params, cfg, econf)
    with ServingEngine(eng) as srv:
        long_fut = srv.submit(prompts[0], 60)
        time.sleep(0.5)                         # long one owns the slot
        queued = srv.submit(prompts[1], 60)
        assert srv.cancel(queued.rid) is True
        with pytest.raises(CancelledError):
            queued.result(timeout=120)
        assert long_fut.result(timeout=300) == expect


def test_cancel_finished_or_unknown_returns_false():
    cfg, params, page = _setup()
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=2, decode_chunk=4)
    eng = InferenceEngine(params, cfg, econf)
    with ServingEngine(eng) as srv:
        fut = srv.submit(_prompts(1)[0], 4)
        toks = fut.result(timeout=120)
        assert srv.cancel(fut.rid) is False     # already finished
        assert fut.result() == toks             # result stands
        assert srv.cancel(10_000) is False      # never existed


def test_engine_level_cancel_via_on_tokens():
    """Request.cancelled is honored by InferenceEngine.run directly (no
    serving front): a row cancelled from the on_tokens callback finishes
    early; the other rows' tokens are untouched."""
    cfg, params, page = _setup()
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=4, decode_chunk=2, stream_links=2)
    prompts = _prompts(3)
    ref = InferenceEngine(params, cfg, econf)
    full = {r.rid: r.tokens
            for r in ref.run([Request(rid=i, prompt=list(p),
                                      max_new_tokens=40)
                              for i, p in enumerate(prompts)])}

    def on_tokens(req, new):
        if req.rid == 0 and len(req.generated) >= 4:
            req.cancelled = True

    eng = InferenceEngine(params, cfg, econf)
    reqs = [Request(rid=i, prompt=list(p), max_new_tokens=40,
                    stream=(i == 0))
            for i, p in enumerate(prompts)]
    done = {r.rid: r for r in eng.run(reqs, on_tokens=on_tokens)}
    assert done[0].state is State.DONE and done[0].cancelled
    assert 4 <= len(done[0].generated) < 40
    assert done[0].tokens == full[0][: len(done[0].tokens)]   # greedy prefix
    for rid in (1, 2):
        assert done[rid].tokens == full[rid]


def test_cancel_mid_chain_nonstream_is_bounded():
    """A cancelled NON-streaming solo request must not decode its whole
    remaining budget: chains check the cancel flag at every link
    boundary and break, so the done-sweep retires the row within a link
    of the cancel landing."""
    cfg, params, page = _setup(page_size=8, num_pages=420, max_seqs=2,
                               pages_per_seq=400)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=1, decode_chunk=2)
    eng = InferenceEngine(params, cfg, econf)
    with ServingEngine(eng) as srv:
        fut = srv.submit(_prompts(1)[0], 3000)
        # live stats refresh at every chain link; pages_free dropping well
        # below the prompt's own pages means the chain is mid-flight
        deadline = time.monotonic() + 120
        while (eng.live_stats.get("pages_free", 10**9) > page.num_pages - 8
               and time.monotonic() < deadline):
            time.sleep(0.01)
        assert srv.cancel(fut.rid) is True
        with pytest.raises(CancelledError):
            fut.result(timeout=300)
        assert eng.live_stats["decode_tokens"] < 3000


def test_precancelled_request_finishes_with_t_done():
    """A request cancelled before the engine ever saw it is retired at
    submission: DONE state, t_done stamped (latency math stays sane)."""
    cfg, params, page = _setup()
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=2, decode_chunk=4)
    eng = InferenceEngine(params, cfg, econf)
    req = Request(rid=0, prompt=[1, 2, 3], max_new_tokens=5)
    req.cancelled = True
    done = eng.run([req])
    assert done[0] is req and req.state is State.DONE
    assert req.t_done is not None and req.generated == []


def test_empty_prompt_fails_future_not_loop():
    """An empty prompt fails ITS future at submission (it has no last
    token to decode from and would stall admission); the loop survives."""
    cfg, params, page = _setup()
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=2, decode_chunk=4)
    eng = InferenceEngine(params, cfg, econf)
    with ServingEngine(eng) as srv:
        bad = srv.submit([], 8)
        with pytest.raises(ValueError, match="empty prompt"):
            bad.result(timeout=10)
        ok = srv.submit(_prompts(1)[0], 5)
        assert len(ok.result(timeout=120)) > 0


def test_http_disconnect_cancels_stream():
    """A raw socket that POSTs a stream request and disconnects after the
    first line cancels it: the slot frees (max_batch=1) and the next HTTP
    request completes with the exact batch tokens."""
    cfg, params, page = _setup()
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=1, decode_chunk=2, stream_links=2)
    prompts = _prompts(2)
    ref = InferenceEngine(params, cfg, econf)
    expect = ref.run([Request(rid=1, prompt=list(prompts[1]),
                              max_new_tokens=30)])[0]

    eng = InferenceEngine(params, cfg, econf)
    with ServingEngine(eng) as srv, HttpServingFront(srv, port=0) as front:
        body = json.dumps({"prompt": prompts[0], "max_new_tokens": 250,
                           "stream": True}).encode()
        s = socket.create_connection((front.host, front.port), timeout=30)
        s.sendall(b"POST /generate HTTP/1.1\r\n"
                  b"Host: x\r\nContent-Type: application/json\r\n"
                  + f"Content-Length: {len(body)}\r\n\r\n".encode() + body)
        buf = b""
        while b"\n" not in buf.split(b"\r\n\r\n", 1)[-1]:
            chunk = s.recv(4096)
            assert chunk, "server closed before first stream line"
            buf += chunk
        s.close()                               # mid-stream disconnect

        import urllib.request
        req = urllib.request.Request(
            f"http://{front.host}:{front.port}/generate",
            data=json.dumps({"prompt": prompts[1],
                             "max_new_tokens": 30}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as resp:
            out = json.loads(resp.read())
        assert out["tokens"] == expect.tokens
