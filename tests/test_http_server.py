"""HTTP serving front tests (engine/http_server): concurrent POSTs batch
through one shared ServingEngine and return exactly the batch-run tokens,
plus the adapter's error paths — malformed bodies (400), unknown paths
(404), queue-full backpressure (503 + Retry-After), and client
disconnect mid-stream cancelling the request (slot/pages released, loop
alive).
"""

import json
import socket
import threading
import time
import urllib.error
import urllib.request

import numpy as np

import jax

from llmc_paged_tpu.config import EngineConfig, GPT2Config, PageConfig
from llmc_paged_tpu.engine.engine import InferenceEngine
from llmc_paged_tpu.engine.http_server import HttpServingFront
from llmc_paged_tpu.engine.scheduler import Request
from llmc_paged_tpu.engine.server import ServingEngine
from llmc_paged_tpu.models import gpt2
from llmc_paged_tpu.tokenizer import Tokenizer, byte_fallback_table


def _post(url, payload, timeout=120):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def test_http_generate_concurrent_matches_batch():
    cfg = GPT2Config.tiny(max_seq_len=128, vocab_size=128, num_layers=2,
                          num_heads=4, channels=32)
    params = jax.tree.map(
        np.asarray, gpt2.init_params(cfg, jax.random.PRNGKey(0)))
    page = PageConfig(page_size=8, num_pages=48, max_seqs=8,
                      pages_per_seq=10)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=3, decode_chunk=4)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, 128, int(n)).tolist() for n in (5, 8, 4, 7)]

    batch_eng = InferenceEngine(params, cfg, econf)
    done = batch_eng.run([Request(rid=i, prompt=list(p), max_new_tokens=6)
                          for i, p in enumerate(prompts)])
    expect = {i: r.tokens for i, r in
              ((r.rid, r) for r in done)}

    eng = InferenceEngine(params, cfg, econf)
    tok = Tokenizer(byte_fallback_table(128))
    with ServingEngine(eng) as srv, \
            HttpServingFront(srv, port=0, tokenizer=tok) as front:
        url = f"http://{front.host}:{front.port}"

        # health endpoint
        with urllib.request.urlopen(f"{url}/health", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"

        # concurrent POSTs — they share the engine's admission waves
        results = {}

        def call(i):
            status, out = _post(f"{url}/generate",
                                {"prompt": prompts[i], "max_new_tokens": 6})
            assert status == 200
            results[i] = out

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(len(prompts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert {i: r["tokens"] for i, r in results.items()} == expect
        for i, r in results.items():
            assert r["generated"] == expect[i][len(prompts[i]):]
            assert isinstance(r["text"], str)

        # bad requests: malformed body and an impossible request both get
        # a 400 with the cause, never a dead loop or a dropped connection
        # (TYPE-malformed bodies used to raise uncaught TypeError; an
        # empty prompt used to stall the whole serving loop)
        for payload in ({"prompt": "not ids"},
                        {"prompt": [1, 2], "max_new_tokens": 10_000},
                        [1, 2, 3],                       # non-dict body
                        "x",                             # non-dict body
                        {"prompt": [1], "max_new_tokens": None},
                        {"prompt": []},                  # empty prompt
                        {"prompt": [1], "logprobs": "false"},  # not bool
                        {"prompt": [1], "priority": 1.5}):     # not int
            try:
                status, out = _post(f"{url}/generate", payload)
            except urllib.error.HTTPError as e:
                status, out = e.code, json.loads(e.read())
            assert status == 400 and "error" in out

        # the loop survived: one more good request
        status, out = _post(f"{url}/generate",
                            {"prompt": prompts[0], "max_new_tokens": 6})
        assert status == 200 and out["tokens"] == expect[0]

        # streaming: newline-delimited JSON batches concatenating to the
        # same tokens, with incremental decoded text
        sreq = urllib.request.Request(
            f"{url}/generate",
            data=json.dumps({"prompt": prompts[0], "max_new_tokens": 6,
                             "stream": True}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(sreq, timeout=120) as r:
            assert r.headers["Content-Type"] == "application/x-ndjson"
            lines = [json.loads(l) for l in r.read().splitlines()]
        assert lines[-1]["done"] is True
        streamed = [t for l in lines[:-1] for t in l["tokens"]]
        assert streamed == expect[0][len(prompts[0]):]
        assert streamed == lines[-1]["generated"]
        assert all(isinstance(l["text"], str) for l in lines[:-1])

        # live metrics: the per-iteration engine snapshot over HTTP
        with urllib.request.urlopen(f"{url}/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["finished_total"] >= len(prompts) + 2
        assert stats["decode_tokens"] > 0 and stats["uptime_s"] > 0
        assert 0 <= stats["pages_free"] <= page.num_pages
        assert stats["running"] == 0 and stats["pending_futures"] == 0


def _tiny_setup():
    cfg = GPT2Config.tiny(max_seq_len=128, vocab_size=128, num_layers=2,
                          num_heads=4, channels=32)
    params = jax.tree.map(
        np.asarray, gpt2.init_params(cfg, jax.random.PRNGKey(0)))
    page = PageConfig(page_size=8, num_pages=48, max_seqs=8,
                      pages_per_seq=10)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=3, decode_chunk=4)
    return cfg, params, econf


def test_http_unknown_paths_404():
    cfg, params, econf = _tiny_setup()
    eng = InferenceEngine(params, cfg, econf)
    with ServingEngine(eng) as srv, HttpServingFront(srv, port=0) as front:
        url = f"http://{front.host}:{front.port}"
        for method, path in (("GET", "/nope"), ("POST", "/nope"),
                             ("POST", "/health")):
            req = urllib.request.Request(
                f"{url}{path}", method=method,
                data=b"{}" if method == "POST" else None)
            try:
                with urllib.request.urlopen(req, timeout=30) as r:
                    status, out = r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                status, out = e.code, json.loads(e.read())
            assert status == 404 and "error" in out, (method, path)


def test_http_queue_full_503_retry_after():
    """Backpressure: with max_pending=1, a second request gets a 503 with
    a Retry-After header while the first is live, and succeeds once the
    queue drains (the 503 must never kill the serving loop)."""
    cfg, params, econf = _tiny_setup()
    eng = InferenceEngine(params, cfg, econf)
    prompt = [3, 1, 4, 1, 5]
    with ServingEngine(eng, max_pending=1) as srv, \
            HttpServingFront(srv, port=0) as front:
        url = f"http://{front.host}:{front.port}"
        blocker = srv.submit(prompt, 64)          # occupies the one slot
        try:
            status, out = _post(f"{url}/generate",
                                {"prompt": prompt, "max_new_tokens": 4})
            headers = {}
        except urllib.error.HTTPError as e:
            status, out, headers = e.code, json.loads(e.read()), e.headers
        assert status == 503 and "error" in out
        assert headers.get("Retry-After") == "1"
        blocker.result(timeout=120)               # queue drains
        status, out = _post(f"{url}/generate",
                            {"prompt": prompt, "max_new_tokens": 4})
        assert status == 200 and len(out["generated"]) == 4


def test_http_stream_client_disconnect_cancels():
    """A client dropping mid-stream must CANCEL its request: the handler
    sees the broken pipe at the next flush and calls StreamHandle.cancel,
    so the engine stops decoding early (slot and pages released) and the
    serving loop keeps taking requests."""
    cfg, params, econf = _tiny_setup()
    eng = InferenceEngine(params, cfg, econf)
    prompt = [2, 7, 1]
    max_new = 75                      # near pool capacity; never finishes
    #                                   naturally within the test's waits
    with ServingEngine(eng) as srv, HttpServingFront(srv, port=0) as front:
        url = f"http://{front.host}:{front.port}"

        def stats():
            with urllib.request.urlopen(f"{url}/stats", timeout=30) as r:
                return json.loads(r.read())

        # one complete request first: compiles every path AND pins down
        # the decode_tokens accounting baseline
        status, out = _post(f"{url}/generate",
                            {"prompt": prompt, "max_new_tokens": 4})
        assert status == 200
        tokens_before = stats()["decode_tokens"]

        body = json.dumps({"prompt": prompt, "max_new_tokens": max_new,
                           "stream": True}).encode()
        s = socket.create_connection((front.host, front.port), timeout=60)
        s.sendall(b"POST /generate HTTP/1.1\r\nHost: t\r\n"
                  b"Content-Type: application/json\r\n"
                  b"Content-Length: %d\r\n\r\n" % len(body) + body)
        # read until the first ndjson token line arrives, then vanish
        buf = b""
        while b"\"tokens\"" not in buf:
            chunk = s.recv(4096)
            assert chunk, "stream closed before first token line"
            buf += chunk
        s.close()

        # the engine must notice (next flush raises BrokenPipeError ->
        # cancel) and clean up: no open streams, nothing running
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            st = stats()
            if st["open_streams"] == 0 and st["running"] == 0 \
                    and st["waiting"] == 0:
                break
            time.sleep(0.05)
        else:
            raise AssertionError(f"stream never cleaned up: {st}")
        # cancelled EARLY: decode stopped well before max_new_tokens
        assert st["decode_tokens"] - tokens_before < max_new, st
        assert st["pages_free"] == econf.page.num_pages  # all pages freed

        # loop alive: one more request completes
        status, out = _post(f"{url}/generate",
                            {"prompt": prompt, "max_new_tokens": 4})
        assert status == 200 and len(out["generated"]) == 4
