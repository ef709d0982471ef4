"""Frequency/presence penalty tests (Request.frequency_penalty /
presence_penalty): OpenAI-style subtraction over FULL-context counts
(prompt + generated, like HF repetition_penalty). Device chains thread
a (B, V) count plane through the chunk scan; the host paths recount
exactly per step. The oracle below replays the penalized greedy pick
step by step from dense forwards.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmc_paged_tpu.config import EngineConfig, GPT2Config, PageConfig
from llmc_paged_tpu.engine.engine import InferenceEngine
from llmc_paged_tpu.engine.scheduler import Request
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


def _greedy_penalized_oracle(cfg, params, prompt, new, fp, pp):
    """Step-by-step dense replay of the penalized greedy pick."""
    dev = gpt2.to_device(params, cfg)
    toks = list(prompt)
    out = []
    for _ in range(new):
        logits = np.asarray(
            gpt2.forward(dev, jnp.asarray([toks]), cfg))[0, -1]
        cnt = np.zeros(cfg.vocab_size, np.float32)
        np.add.at(cnt, np.asarray(toks), 1.0)
        pen = logits.astype(np.float32) - fp * cnt - pp * (cnt > 0)
        t = int(np.argmax(pen))
        out.append(t)
        toks.append(t)
    return out


def test_penalized_greedy_chain_matches_oracle():
    """Greedy engine (chunk chains, rng=None) with penalties: tokens
    equal the dense penalized replay; an unpenalized neighbor in the
    same batch keeps the plain greedy stream."""
    cfg, params, page = _setup()
    prompts = _prompts(2)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=2, decode_chunk=4)
    plain = InferenceEngine(params, cfg, econf).run(
        [Request(rid=1, prompt=list(prompts[1]), max_new_tokens=12)])[0]

    eng = InferenceEngine(params, cfg, econf)
    done = {r.rid: r for r in eng.run(
        [Request(rid=0, prompt=list(prompts[0]), max_new_tokens=12,
                 frequency_penalty=0.7, presence_penalty=0.3),
         Request(rid=1, prompt=list(prompts[1]), max_new_tokens=12)])}
    oracle = _greedy_penalized_oracle(cfg, params, prompts[0], 12,
                                      0.7, 0.3)
    assert done[0].generated == oracle
    assert done[1].tokens == plain.tokens
    # on random-init flat logits a strong penalty must actually change
    # the stream (plain greedy loops on one token)
    plain0 = InferenceEngine(params, cfg, econf).run(
        [Request(rid=0, prompt=list(prompts[0]), max_new_tokens=12)])[0]
    assert done[0].generated != plain0.generated


def test_penalized_host_single_token_path_matches_oracle():
    """Parity-sampler engine (no chaining) with a greedy+penalty
    override row: the host recount path gives the same tokens as the
    device chain (both equal the oracle)."""
    cfg, params, page = _setup()
    prompts = _prompts(1)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=False,
                         max_batch=2, decode_chunk=4)
    eng = InferenceEngine(params, cfg, econf)
    done = eng.run([Request(rid=0, prompt=list(prompts[0]),
                            max_new_tokens=10, greedy=True,
                            frequency_penalty=0.9)])
    oracle = _greedy_penalized_oracle(cfg, params, prompts[0], 10,
                                      0.9, 0.0)
    assert done[0].generated == oracle


def test_penalties_compose_with_device_sampling_and_stops():
    """Penalty rows ride device-sampling chains next to plain rows;
    stop tokens still truncate; logprobs stay raw-softmax aligned."""
    cfg, params, page = _setup()
    prompts = _prompts(3)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=4, decode_chunk=4, device_sampling=True)
    plain = {r.rid: r.tokens for r in InferenceEngine(params, cfg, econf)
             .run([Request(rid=i, prompt=list(p), max_new_tokens=10)
                   for i, p in enumerate(prompts)])}
    eng = InferenceEngine(params, cfg, econf)
    oracle0 = _greedy_penalized_oracle(cfg, params, prompts[0], 10,
                                       0.5, 0.5)
    done = {r.rid: r for r in eng.run(
        [Request(rid=0, prompt=list(prompts[0]), max_new_tokens=10,
                 frequency_penalty=0.5, presence_penalty=0.5,
                 logprobs=True, stop_tokens=[oracle0[4]]),
         Request(rid=1, prompt=list(prompts[1]), max_new_tokens=10,
                 temperature=0.8, greedy=False, frequency_penalty=1.0),
         Request(rid=2, prompt=list(prompts[2]), max_new_tokens=10)])}
    # penalized greedy row: oracle prefix, truncated at its stop id
    cut = oracle0.index(oracle0[4]) + 1
    assert done[0].generated == oracle0[:cut]
    assert len(done[0].logprob_values) == len(done[0].generated)
    assert len(done[1].generated) == 10
    assert done[2].tokens == plain[2]      # plain neighbor untouched


def test_penalty_validation():
    cfg, params, page = _setup()
    eng = InferenceEngine(params, cfg, EngineConfig(
        cache_mode="paged", page=page, greedy=True, spec_k=3))
    with pytest.raises(ValueError, match="speculative"):
        eng.validate_request(Request(rid=0, prompt=[1], max_new_tokens=4,
                                     frequency_penalty=0.5))
    eng2 = InferenceEngine(params, cfg, EngineConfig(
        cache_mode="paged", page=page, greedy=True))
    with pytest.raises(ValueError, match="finite"):
        eng2.validate_request(Request(rid=0, prompt=[1], max_new_tokens=4,
                                      presence_penalty=float("nan")))
