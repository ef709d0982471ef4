"""Per-request sampling overrides (Request.temperature/top_k/greedy).

Contract: overrides resolve against the engine sampler per request; rows
WITHOUT overrides behave bit-identically to a uniform batch (greedy rows
keep the argmax stream; the shared xorshift stream is consumed by
stochastic rows in row order). A top_k=1 override is deterministic
(top-1 sampling IS the argmax), which makes the transform plumbing
checkable end-to-end on both the host parity path and the device
sampling chunk path. No reference analogue (one sampler per binary,
train_gpt2.c:1052-1063); this is per-request serving API surface.
"""

import json
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from llmc_paged_tpu.config import EngineConfig, GPT2Config, PageConfig
from llmc_paged_tpu.engine.engine import InferenceEngine
from llmc_paged_tpu.engine.http_server import HttpServingFront
from llmc_paged_tpu.engine.scheduler import Request
from llmc_paged_tpu.engine.server import ServingEngine
from llmc_paged_tpu.models import gpt2


def _setup(seed=0):
    cfg = GPT2Config.tiny(max_seq_len=128, vocab_size=128, num_layers=2,
                          num_heads=4, channels=32)
    params = jax.tree.map(
        np.asarray, gpt2.init_params(cfg, jax.random.PRNGKey(seed)))
    page = PageConfig(page_size=8, num_pages=48, max_seqs=8, pages_per_seq=10)
    return cfg, params, page


def _prompts(n, lo=3, hi=12, seed=7):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 128, int(ln)).tolist()
            for ln in rng.integers(lo, hi, n)]


def _greedy_reference(cfg, params, page, prompts, new):
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=4, decode_chunk=4)
    eng = InferenceEngine(params, cfg, econf)
    done = eng.run([Request(rid=i, prompt=list(p), max_new_tokens=new)
                    for i, p in enumerate(prompts)])
    return {r.rid: r.tokens for r in done}


def test_greedy_and_topk1_overrides_on_host_parity_path():
    """Engine sampler is the stochastic parity sampler; one request
    overrides greedy=True and another top_k=1 (top-1 sampling = argmax):
    both must reproduce the pure-greedy tokens exactly; the plain row
    still decodes to full length."""
    cfg, params, page = _setup()
    prompts = _prompts(3)
    full = _greedy_reference(cfg, params, page, prompts, 10)

    econf = EngineConfig(cache_mode="paged", page=page, greedy=False,
                         max_batch=4, decode_chunk=4)
    eng = InferenceEngine(params, cfg, econf)
    reqs = [Request(rid=0, prompt=list(prompts[0]), max_new_tokens=10,
                    greedy=True),
            Request(rid=1, prompt=list(prompts[1]), max_new_tokens=10,
                    top_k=1),
            Request(rid=2, prompt=list(prompts[2]), max_new_tokens=10)]
    done = {r.rid: r for r in eng.run(reqs)}
    assert done[0].tokens == full[0]
    assert done[1].tokens == full[1]
    assert len(done[2].generated) == 10


def test_overrides_on_device_sampling_chunks():
    """device_sampling chains with per-row arrays: rows without overrides
    on a GREEDY engine keep the exact pure-greedy stream even when a
    stochastic override row shares their chunk chain; a top_k=1 override
    row is deterministic through the device categorical too."""
    cfg, params, page = _setup()
    prompts = _prompts(4)
    full = _greedy_reference(cfg, params, page, prompts, 12)

    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=4, decode_chunk=4, device_sampling=True)
    eng = InferenceEngine(params, cfg, econf)
    reqs = [Request(rid=0, prompt=list(prompts[0]), max_new_tokens=12),
            Request(rid=1, prompt=list(prompts[1]), max_new_tokens=12,
                    temperature=0.8, top_k=5, greedy=False),
            Request(rid=2, prompt=list(prompts[2]), max_new_tokens=12,
                    top_k=1, greedy=False),
            Request(rid=3, prompt=list(prompts[3]), max_new_tokens=12)]
    done = {r.rid: r for r in eng.run(reqs)}
    assert done[0].tokens == full[0]          # untouched greedy rows
    assert done[3].tokens == full[3]
    assert done[2].tokens == full[2]          # top-1 sampling == argmax
    assert len(done[1].generated) == 12


def test_temperature_zero_override_means_greedy():
    cfg, params, page = _setup()
    prompts = _prompts(1)
    full = _greedy_reference(cfg, params, page, prompts, 8)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=False,
                         max_batch=2, decode_chunk=4)
    eng = InferenceEngine(params, cfg, econf)
    done = eng.run([Request(rid=0, prompt=list(prompts[0]),
                            max_new_tokens=8, temperature=0.0)])
    assert done[0].tokens == full[0]


def test_stochastic_override_on_greedy_engine_actually_samples():
    """greedy=False override on a GREEDY engine must draw from the RNG
    stream, not silently argmax (Sampler.sample's greedy short-circuit
    is bypassed)."""
    cfg, params, page = _setup()
    prompts = _prompts(1)
    full = _greedy_reference(cfg, params, page, prompts, 16)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=2, decode_chunk=4)
    eng = InferenceEngine(params, cfg, econf)
    done = eng.run([Request(rid=0, prompt=list(prompts[0]),
                            max_new_tokens=16, greedy=False)])
    # 16 flat-logit draws over V=128: P(all == argmax) is negligible
    assert done[0].tokens != full[0]
    assert len(done[0].generated) == 16


def test_mixed_batch_keeps_plain_row_stream_bit_exact():
    """A no-override stochastic row next to a greedy-override row must
    sample BIT-IDENTICALLY to running alone (same device softmax, same
    xorshift stream positions — greedy rows consume no coins)."""
    cfg, params, page = _setup()
    prompts = _prompts(2)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=False,
                         max_batch=2, decode_chunk=4)
    solo = InferenceEngine(params, cfg, econf).run(
        [Request(rid=0, prompt=list(prompts[0]), max_new_tokens=10)])
    mixed = InferenceEngine(params, cfg, econf).run(
        [Request(rid=0, prompt=list(prompts[0]), max_new_tokens=10),
         Request(rid=1, prompt=list(prompts[1]), max_new_tokens=10,
                 greedy=True)])
    got = {r.rid: r.tokens for r in mixed}
    assert got[0] == solo[0].tokens


def test_topk_full_vocab_means_no_filter():
    """top_k >= V is 'keep everything' on BOTH paths (the device chunk
    must not clamp it to V-1 and mask the row-minimum tokens)."""
    cfg, params, page = _setup()
    prompts = _prompts(2)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=2, decode_chunk=4, device_sampling=True)
    eng = InferenceEngine(params, cfg, econf)
    done = eng.run([Request(rid=0, prompt=list(prompts[0]),
                            max_new_tokens=8, greedy=False,
                            top_k=cfg.vocab_size),
                    Request(rid=1, prompt=list(prompts[1]),
                            max_new_tokens=8, greedy=False, top_k=5)])
    assert all(len(r.generated) == 8 for r in done)


def test_override_validation():
    cfg, params, page = _setup()
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=2, decode_chunk=4)
    eng = InferenceEngine(params, cfg, econf)
    with ServingEngine(eng) as srv:
        bad_t = srv.submit([1, 2], 4, temperature=-1.0)
        with pytest.raises(ValueError, match="temperature"):
            bad_t.result(timeout=10)
        bad_nan = srv.submit([1, 2], 4, temperature=float("nan"))
        with pytest.raises(ValueError, match="temperature"):
            bad_nan.result(timeout=10)
        bad_k = srv.submit([1, 2], 4, top_k=0)
        with pytest.raises(ValueError, match="top_k"):
            bad_k.result(timeout=10)
        ok = srv.submit(_prompts(1)[0], 4, temperature=0.9, top_k=3,
                        greedy=False)
        assert len(ok.result(timeout=120)) > 0

    # spec_k serving rejects non-greedy overrides (cannot be verified)
    econf_spec = EngineConfig(cache_mode="paged", page=page, greedy=True,
                              max_batch=2, decode_chunk=4, spec_k=3)
    eng2 = InferenceEngine(params, cfg, econf_spec)
    with pytest.raises(ValueError, match="spec_k"):
        eng2.validate_request(Request(rid=0, prompt=[1], max_new_tokens=4,
                                      greedy=False))


def test_http_per_request_sampling():
    """top_k=1 over HTTP equals the greedy run; a type-malformed greedy
    flag gets a 400."""
    cfg, params, page = _setup()
    prompts = _prompts(1)
    full = _greedy_reference(cfg, params, page, prompts, 6)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=False,
                         max_batch=2, decode_chunk=4)
    eng = InferenceEngine(params, cfg, econf)
    with ServingEngine(eng) as srv, HttpServingFront(srv, port=0) as front:
        url = f"http://{front.host}:{front.port}/generate"

        def post(payload):
            req = urllib.request.Request(
                url, data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        status, out = post({"prompt": prompts[0], "max_new_tokens": 6,
                            "top_k": 1})
        assert status == 200 and out["tokens"] == full[0]
        status, out = post({"prompt": prompts[0], "max_new_tokens": 6,
                            "greedy": "yes"})
        assert status == 400 and "greedy" in out["error"]
        status, out = post({"prompt": prompts[0], "max_new_tokens": 6,
                            "temperature": -2})
        assert status == 400 and "temperature" in out["error"]
