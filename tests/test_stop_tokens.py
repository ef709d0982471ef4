"""Stop-token (EOS) termination tests.

Contract: generation ends after the first stop id appears (kept as the
last generated token), and the resulting stream is exactly the PREFIX of
the same request run without stops — chains overshoot past a stop and
the engine must discard the excess (including its decode_tokens
accounting). All three cache modes, the spec path, and the serving/
streaming fronts agree. The reference generates fixed counts only
(paged_infer.c:1055); stop ids are the serving-completeness extension.
"""

import numpy as np
import pytest

import jax

from llmc_paged_tpu.config import EngineConfig, GPT2Config, PageConfig
from llmc_paged_tpu.engine.engine import InferenceEngine
from llmc_paged_tpu.engine.scheduler import Request
from llmc_paged_tpu.engine.server import ServingEngine
from llmc_paged_tpu.models import gpt2


def _setup(seed=0):
    cfg = GPT2Config.tiny(max_seq_len=128, vocab_size=64, num_layers=2,
                          num_heads=4, channels=32)
    params = jax.tree.map(
        np.asarray, gpt2.init_params(cfg, jax.random.PRNGKey(seed)))
    page = PageConfig(page_size=8, num_pages=48, max_seqs=8,
                      pages_per_seq=10)
    return cfg, params, page


def _prompts(n, seed=7):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 64, int(ln)).tolist()
            for ln in rng.integers(4, 10, n)]


def _expected_with_stop(full_tokens, prompt_len, stop_ids):
    """Reference semantics on the unstopped stream: cut after the first
    stop id in the generated part."""
    gen = full_tokens[prompt_len:]
    for k, t in enumerate(gen):
        if t in stop_ids:
            return full_tokens[: prompt_len + k + 1]
    return list(full_tokens)


def _pick_stop(full, prompt_len):
    """A token the model actually generates mid-stream (not the first or
    last generated position) so stopping is observable."""
    gen = full[prompt_len:]
    return gen[min(3, len(gen) - 2)]


@pytest.mark.parametrize("spec_k", [0, 3])
def test_paged_stop_equals_truncated_greedy(spec_k):
    cfg, params, page = _setup()
    prompts = _prompts(4)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=2, decode_chunk=4, spec_k=spec_k)
    eng = InferenceEngine(params, cfg, econf)
    NEW = 16
    full = {r.rid: r.tokens for r in eng.run(
        [Request(rid=i, prompt=list(p), max_new_tokens=NEW)
         for i, p in enumerate(prompts)])}
    stops = {i: [_pick_stop(full[i], len(p))]
             for i, p in enumerate(prompts)}
    done = eng.run([Request(rid=i, prompt=list(p), max_new_tokens=NEW,
                            stop_tokens=stops[i])
                    for i, p in enumerate(prompts)])
    kept_total = 0
    for r in done:
        exp = _expected_with_stop(full[r.rid], len(prompts[r.rid]),
                                  stops[r.rid])
        assert r.tokens == exp, r.rid
        assert r.tokens[-1] == stops[r.rid][0]   # stop id is kept
        assert len(r.tokens) < len(full[r.rid])  # actually stopped early
        kept_total += len(r.generated)
    # decode accounting counts KEPT tokens only (chain overshoot is
    # discarded): first tokens come from prefill, not decode
    assert eng.stats["decode_tokens"] == kept_total - len(done)


def test_three_modes_stop_identically():
    cfg, params, page = _setup()
    prompt = _prompts(1)[0]
    NEW = 12

    def run(stop_ids):
        outs = {}
        for mode in ("none", "dense", "paged"):
            econf = EngineConfig(cache_mode=mode, page=page, greedy=True,
                                 max_batch=1, decode_chunk=4,
                                 stop_tokens=tuple(stop_ids))
            eng = InferenceEngine(params, cfg, econf)
            outs[mode] = eng.generate(prompt, NEW)
        assert outs["none"] == outs["dense"] == outs["paged"]
        return outs["paged"]

    full = run(())
    stop = _pick_stop(full, len(prompt))
    stopped = run((stop,))
    assert stopped == _expected_with_stop(full, len(prompt), {stop})
    assert len(stopped) < len(full)


def test_serving_stream_stops_cleanly():
    """Streams deliver no post-stop tokens; the future/iterator end at the
    stop id; a per-request stop overrides the engine default of none."""
    cfg, params, page = _setup()
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=2, decode_chunk=4, stream_links=1)
    prompts = _prompts(2, seed=9)
    eng_b = InferenceEngine(params, cfg, econf)
    full = {r.rid: r.tokens for r in eng_b.run(
        [Request(rid=i, prompt=list(p), max_new_tokens=20)
         for i, p in enumerate(prompts)])}
    stop0 = _pick_stop(full[0], len(prompts[0]))

    eng = InferenceEngine(params, cfg, econf)
    with ServingEngine(eng) as srv:
        it = srv.submit_stream(prompts[0], 20, rid=0, stop_tokens=[stop0])
        fut = srv.submit(prompts[1], 20, rid=1)     # no stop: full length
        streamed = [t for b in it for t in b]
        exp = _expected_with_stop(full[0], len(prompts[0]), {stop0})
        assert list(prompts[0]) + streamed == exp
        assert streamed[-1] == stop0
        assert fut.result(timeout=120) == full[1]
