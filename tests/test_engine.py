"""Engine equivalence + scheduler tests.

The end-to-end comparison the reference lacks (SURVEY.md §4 gaps): its
three mains never check that uncached / cached / paged decode produce the
same tokens. Here all three modes must emit IDENTICAL token streams under
greedy decoding, with and without the sliding window; plus continuous
batching under pool pressure (preemption, requeue, completion)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from llmc_paged_tpu import formats
from llmc_paged_tpu.config import EngineConfig, PageConfig
from llmc_paged_tpu.engine.engine import InferenceEngine
from llmc_paged_tpu.engine.scheduler import Request
from conftest import assert_stream_equal
from llmc_paged_tpu.sampler import Sampler
from llmc_paged_tpu.utils.dataloader import DataLoader


@pytest.fixture(scope="module")
def setup(fixtures_dir):
    cfg, params = formats.read_checkpoint(
        os.path.join(fixtures_dir, "model_tiny.bin"))
    stream = formats.read_token_stream(
        os.path.join(fixtures_dir, "tokens_tiny.bin"))
    return cfg, params, stream


def make_engine(cfg, params, mode, **kw):
    page = PageConfig(page_size=8, num_pages=64, max_seqs=8, pages_per_seq=8)
    econf = EngineConfig(cache_mode=mode, page=page, greedy=True,
                         max_batch=kw.pop("max_batch", 4))
    return InferenceEngine(params, cfg, econf, **kw)


def test_three_modes_identical_tokens(setup):
    cfg, params, stream = setup
    prompt = stream[:8].tolist()
    outs = {}
    for mode in ("none", "dense", "paged"):
        eng = make_engine(cfg, params, mode)
        outs[mode] = eng.generate(prompt, 20)
    assert_stream_equal(outs["none"], outs["dense"], "none vs dense")
    assert_stream_equal(outs["none"], outs["paged"], "none vs paged")


def test_three_modes_identical_with_window(setup):
    """Sliding-window parity: all three modes slide a 16-token window
    (the reference mains' T=32-window behavior at tiny scale)."""
    cfg, params, stream = setup
    prompt = stream[:8].tolist()
    outs = {}
    for mode in ("none", "dense", "paged"):
        eng = make_engine(cfg, params, mode)
        outs[mode] = eng.generate(prompt, 24, window=16)
    assert_stream_equal(outs["none"], outs["dense"], "none vs dense")
    assert_stream_equal(outs["none"], outs["paged"], "none vs paged")
    # the window must actually matter
    eng = make_engine(cfg, params, "none")
    assert outs["none"] != eng.generate(prompt, 24)


def test_sampled_modes_identical(setup):
    """With the parity RNG, dense and paged paths sample identical streams
    (probabilities agree to ~1e-6 so CDF walks agree)."""
    cfg, params, stream = setup
    prompt = stream[:8].tolist()
    outs = {}
    for mode in ("dense", "paged"):
        eng = make_engine(cfg, params, mode)
        outs[mode] = eng.generate(prompt, 20,
                                  sampler=Sampler(seed=1337, greedy=False))
    assert outs["dense"] == outs["paged"]


def test_continuous_batching_mixed_lengths(setup):
    cfg, params, stream = setup
    eng = make_engine(cfg, params, "paged", max_batch=4)
    reqs = [Request(rid=i, prompt=stream[i * 7: i * 7 + 3 + i].tolist(),
                    max_new_tokens=6 + i) for i in range(6)]
    done = eng.run(reqs)
    assert len(done) == 6
    for r in done:
        assert len(r.generated) == r.max_new_tokens
        assert r.ttft is not None and r.ttft >= 0
    assert eng.stats["decode_tokens"] > 0

    # every request's tokens must match its single-sequence greedy decode
    for r in done:
        solo = make_engine(cfg, params, "paged").generate(
            r.prompt, r.max_new_tokens)
        assert r.tokens == solo, r.rid


def test_preemption_under_pool_pressure(setup):
    """A pool far too small for all sequences forces LRU preemption; every
    request must still finish with exactly its requested tokens and the
    recompute-after-preempt path must not corrupt outputs."""
    cfg, params, stream = setup
    page = PageConfig(page_size=4, num_pages=10, max_seqs=8, pages_per_seq=8)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=3)
    eng = InferenceEngine(params, cfg, econf)
    reqs = [Request(rid=i, prompt=stream[i * 5: i * 5 + 4].tolist(),
                    max_new_tokens=10) for i in range(4)]
    done = eng.run(reqs)
    assert len(done) == 4
    assert eng.stats["preemptions"] > 0, "pressure test must actually preempt"
    for r in done:
        assert len(r.generated) == 10
        solo = make_engine(cfg, params, "paged").generate(r.prompt, 10)
        assert r.tokens == solo, f"request {r.rid} corrupted by preemption"


def test_request_too_large_rejected(setup):
    cfg, params, stream = setup
    eng = make_engine(cfg, params, "paged")
    with pytest.raises(ValueError, match="max_context"):
        eng.run([Request(rid=0, prompt=stream[:8].tolist(),
                         max_new_tokens=10_000)])


def test_pool_too_small_raises(setup):
    """An unfittable request is rejected at submit (ValueError) rather than
    livelocking until the scheduler stall detector fires."""
    cfg, params, stream = setup
    page = PageConfig(page_size=4, num_pages=2, max_seqs=4, pages_per_seq=8)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=2)
    eng = InferenceEngine(params, cfg, econf)
    with pytest.raises(ValueError, match="pages > pool"):
        eng.run([Request(rid=0, prompt=stream[:16].tolist(),
                         max_new_tokens=4)])


def test_dataloader_parity(setup, fixtures_dir):
    """DataLoader strides and wraparound match train_gpt2.c:1016-1028."""
    cfg, params, stream = setup
    dl = DataLoader(os.path.join(fixtures_dir, "tokens_tiny.bin"), B=2, T=8)
    x1, y1 = dl.next_batch()
    np.testing.assert_array_equal(x1.ravel(), stream[:16])
    np.testing.assert_array_equal(y1.ravel(), stream[1:17])
    x2, _ = dl.next_batch()
    np.testing.assert_array_equal(x2.ravel(), stream[16:32])
    # wraparound: the final stride would need B*T+1 tokens past the end, so
    # it wraps exactly like train_gpt2.c:1020 (the Nth batch re-reads the
    # stream head)
    n = len(stream) // 16
    dl.reset()
    for _ in range(n - 1):
        dl.next_batch()
    xw, _ = dl.next_batch()
    np.testing.assert_array_equal(xw.ravel(), stream[:16])


def test_cli_end_to_end(setup, fixtures_dir):
    out = subprocess.run(
        [sys.executable, "-m", "llmc_paged_tpu.engine.cli",
         "--checkpoint", os.path.join(fixtures_dir, "model_tiny.bin"),
         "--tokenizer", os.path.join(fixtures_dir, "tokenizer_tiny.bin"),
         "--data", os.path.join(fixtures_dir, "tokens_tiny.bin"),
         "--mode", "paged", "--batch", "3", "--prompt-size", "6",
         "--max-new", "8", "--page-size", "8", "--num-pages", "32",
         "--pages-per-seq", "8", "--greedy", "--json"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "LLMC_PLATFORM": "cpu",
             "PYTHONPATH": os.path.join(os.path.dirname(__file__), "..") +
             os.pathsep + os.environ.get("PYTHONPATH", "")})
    assert out.returncode == 0, out.stderr[-2000:]
    import json
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert len(payload["tokens"]) == 3
    for toks in payload["tokens"].values():
        assert len(toks) == 14


def test_chunk_chain_matches_unchunked(setup):
    """The async chunk chain (device-fed tokens across links, lazy
    materialisation) must emit exactly the tokens of the single-step path,
    including rows finishing mid-chain with different max_new."""
    cfg, params, stream = setup
    page = PageConfig(page_size=8, num_pages=64, max_seqs=8, pages_per_seq=8)
    prompts = [stream[i * 7: i * 7 + 6].tolist() for i in range(3)]
    lens = [5, 20, 33]

    def run(decode_chunk):
        econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                             max_batch=3, decode_chunk=decode_chunk)
        eng = InferenceEngine(params, cfg, econf)
        reqs = [Request(rid=i, prompt=prompts[i], max_new_tokens=lens[i])
                for i in range(3)]
        done = eng.run(reqs)
        return {r.rid: r.tokens for r in done}

    ref = run(1)
    chained = run(8)
    assert chained == ref
    for i in range(3):
        assert len(ref[i]) == len(prompts[i]) + lens[i]


def test_debug_checks_validates_clean_run(setup):
    """EngineConfig.debug_checks host-validates every device-bound index; a
    healthy run must pass all assertions and produce identical tokens."""
    cfg, params, stream = setup
    prompt = stream[:8].tolist()
    page = PageConfig(page_size=8, num_pages=64, max_seqs=8, pages_per_seq=8)
    outs = {}
    for dbg in (False, True):
        econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                             max_batch=2, debug_checks=dbg)
        outs[dbg] = InferenceEngine(params, cfg, econf).generate(prompt, 12)
    assert_stream_equal(outs[False], outs[True], "debug_checks on/off")


def test_device_sampling_topk1_equals_greedy(setup):
    """On-device chunked sampling with top_k=1 must reproduce the greedy
    stream exactly (the categorical collapses to the argmax)."""
    cfg, params, stream = setup
    prompt = stream[:8].tolist()
    page = PageConfig(page_size=8, num_pages=64, max_seqs=8, pages_per_seq=8)
    greedy = InferenceEngine(params, cfg, EngineConfig(
        cache_mode="paged", page=page, greedy=True, max_batch=1,
        decode_chunk=8)).generate(prompt, 20)
    sampled = InferenceEngine(params, cfg, EngineConfig(
        cache_mode="paged", page=page, greedy=False, top_k=1,
        device_sampling=True, max_batch=1,
        decode_chunk=8)).generate(prompt, 20)
    assert sampled == greedy


def test_device_sampling_respects_topk_support(setup):
    """Every device-sampled token must lie in the model's per-position
    top-k set (teacher-forced check on the generated sequence)."""
    import jax.numpy as jnp

    from llmc_paged_tpu.models import gpt2

    cfg, params, stream = setup
    prompt = stream[:8].tolist()
    K = 3
    page = PageConfig(page_size=8, num_pages=64, max_seqs=8, pages_per_seq=8)
    eng = InferenceEngine(params, cfg, EngineConfig(
        cache_mode="paged", page=page, greedy=False, top_k=K,
        device_sampling=True, max_batch=1, decode_chunk=8, seed=7))
    toks = eng.generate(prompt, 16)
    assert len(toks) == len(prompt) + 16
    dev = gpt2.to_device(params, cfg)
    logits = np.asarray(gpt2.forward(dev, jnp.asarray([toks[:-1]], jnp.int32),
                                     cfg))[0]
    for pos in range(len(prompt) - 1, len(toks) - 1):
        topk = set(np.argsort(logits[pos])[-K:].tolist())
        assert toks[pos + 1] in topk, (pos, toks[pos + 1], topk)


def test_same_wave_admission_eviction_no_corruption(setup):
    """An admission whose pages get LRU-evicted by a LATER admission in the
    same wave must be dropped from that wave's prefill (otherwise its K/V
    scatter goes through a cleared block table into page 0, corrupting the
    new owner). The victim is requeued and must still finish with the same
    tokens it would produce alone."""
    cfg, params, stream = setup
    # pool of 12 pages, page_size 8: A (64 tokens, 8 pages) + B (80 tokens,
    # 10 pages) cannot coexist; B's admission evicts A mid-wave
    page = PageConfig(page_size=8, num_pages=12, max_seqs=4, pages_per_seq=12)
    pa = stream[:64].tolist()
    pb = stream[5:85].tolist()
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=2, decode_chunk=4)
    eng = InferenceEngine(params, cfg, econf)
    done = eng.run([Request(rid=0, prompt=pa, max_new_tokens=6),
                    Request(rid=1, prompt=pb, max_new_tokens=6)])
    outs = {r.rid: r.tokens for r in done}
    assert len(outs[0]) == 64 + 6 and len(outs[1]) == 80 + 6
    # solo references
    for rid, prompt in ((0, pa), (1, pb)):
        solo = InferenceEngine(params, cfg, econf).generate(prompt, 6)
        assert outs[rid] == solo, f"request {rid} corrupted"


def test_three_modes_identical_prompt_longer_than_window(setup):
    """Prompt LONGER than the sliding window: dense/paged must truncate to
    the trailing window at prefill (mode-"none" parity) instead of letting
    prompt tokens attend beyond the window with unclamped positions."""
    cfg, params, stream = setup
    prompt = stream[:20].tolist()
    window = 8
    outs = {}
    for mode in ("none", "dense", "paged"):
        eng = make_engine(cfg, params, mode)
        outs[mode] = eng.generate(prompt, 12, window=window)
    assert_stream_equal(outs["none"], outs["dense"], "none vs dense")
    assert_stream_equal(outs["none"], outs["paged"], "none vs paged")


def test_unfittable_request_rejected_upfront(setup):
    """A request that can never fit the physical pool must be rejected at
    submit instead of livelocking the scheduler (retry-at-head forever,
    evicting every running sequence each round)."""
    cfg, params, stream = setup
    page = PageConfig(page_size=4, num_pages=4, max_seqs=4, pages_per_seq=8)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=2)
    eng = InferenceEngine(params, cfg, econf)
    with pytest.raises(ValueError, match="pages > pool"):
        eng.run([Request(rid=0, prompt=stream[:20].tolist(),
                         max_new_tokens=8)])


def test_pool_pressure_nongreedy_no_crash(setup):
    """The confirmed stale-snapshot crash: under pool pressure with the
    NON-greedy (single-token) path, an eviction that preempts a
    not-yet-processed slot must not KeyError or corrupt the manager."""
    cfg, params, stream = setup
    page = PageConfig(page_size=4, num_pages=3, max_seqs=4, pages_per_seq=3)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=False,
                         max_batch=2)
    eng = InferenceEngine(params, cfg, econf)
    reqs = [Request(rid=0, prompt=stream[:1].tolist(), max_new_tokens=6),
            Request(rid=1, prompt=stream[1:5].tolist(), max_new_tokens=6)]
    done = eng.run(reqs)
    assert sorted(r.rid for r in done) == [0, 1]
    for r in done:
        assert len(r.generated) == 6


def test_max_new_tokens_zero_consistent(setup):
    """max_new_tokens=0 must produce zero generated tokens in every mode
    (dense/paged previously emitted one unconditional post-prefill sample,
    also consuming a parity-RNG draw)."""
    cfg, params, stream = setup
    prompt = stream[:8].tolist()
    for mode in ("none", "dense", "paged"):
        eng = make_engine(cfg, params, mode)
        assert eng.generate(prompt, 0) == prompt, mode


def test_window_larger_than_max_seq_len_rejected(setup):
    """window > max_seq_len would silently clamp the wpe gather on device
    (garbage embeddings); all modes must reject it up front."""
    cfg, params, stream = setup
    prompt = stream[:8].tolist()
    for mode in ("none", "dense", "paged"):
        eng = make_engine(cfg, params, mode)
        with pytest.raises(ValueError, match="max_seq_len"):
            eng.generate(prompt, 4, window=cfg.max_seq_len + 1)


# -- speculative decoding (EngineConfig.spec_k) -------------------------------

def make_spec_engine(cfg, params, spec_k, max_batch=4, num_pages=64,
                     **ekw):
    page = PageConfig(page_size=8, num_pages=num_pages, max_seqs=8,
                      pages_per_seq=8)
    econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                         max_batch=max_batch, decode_chunk=4,
                         spec_k=spec_k, **ekw)
    return InferenceEngine(params, cfg, econf)


def test_spec_tokens_equal_plain_greedy(setup):
    """spec_k serving emits exactly the plain greedy token stream for a
    whole mixed-length batch, and the speculative path actually runs."""
    cfg, params, stream = setup
    reqs = lambda: [Request(rid=i, prompt=stream[i * 5: i * 5 + 4 + i]
                            .tolist(), max_new_tokens=8 + 2 * i)
                    for i in range(4)]
    plain = make_engine(cfg, params, "paged")
    base = {r.rid: r.tokens for r in plain.run(reqs())}
    spec = make_spec_engine(cfg, params, spec_k=3)
    done = spec.run(reqs())
    assert {r.rid: r.tokens for r in done} == base
    assert spec.stats["spec_steps"] > 0, "speculative path never engaged"
    assert spec.stats["spec_tok_per_step"] >= 1.0
    # decode_tokens excludes each row's first token (produced by prefill)
    assert spec.stats["decode_tokens"] == sum(8 + 2 * i - 1 for i in range(4))


def test_spec_acceptance_on_repetitive_prompt(setup):
    """A strongly periodic prompt makes the tiny model's greedy
    continuation loop, so n-gram drafting must accept > 1 token/step —
    the mechanism, not just the fallback, is exercised."""
    cfg, params, _ = setup
    prompt = [7, 3, 7, 3, 7, 3, 7, 3]
    spec = make_spec_engine(cfg, params, spec_k=4)
    done = spec.run([Request(rid=0, prompt=prompt, max_new_tokens=24)])
    plain = make_engine(cfg, params, "paged").generate(prompt, 24)
    assert done[0].tokens == plain
    assert spec.stats["spec_tok_per_step"] > 1.0, \
        f"no acceptance on a periodic stream: {spec.stats}"


def test_spec_under_queue_pressure(setup):
    """More requests than slots: speculative chains must interleave with
    admission, finish every request, and match solo greedy decodes."""
    cfg, params, stream = setup
    spec = make_spec_engine(cfg, params, spec_k=3, max_batch=2,
                            num_pages=24)
    reqs = [Request(rid=i, prompt=stream[i * 3: i * 3 + 3 + (i % 3)]
                    .tolist(), max_new_tokens=7 + i) for i in range(5)]
    done = spec.run(reqs)
    assert len(done) == 5
    for r in done:
        assert len(r.generated) == r.max_new_tokens
        solo = make_engine(cfg, params, "paged").generate(
            r.prompt, r.max_new_tokens)
        assert r.tokens == solo, r.rid


def test_spec_invalid_configs_rejected(setup):
    cfg, params, stream = setup
    prompt = stream[:6].tolist()
    spec = make_spec_engine(cfg, params, spec_k=3)
    with pytest.raises(ValueError, match="greedy"):
        spec.run([Request(rid=0, prompt=prompt, max_new_tokens=4)],
                 sampler=Sampler(seed=1, greedy=False))
    with pytest.raises(ValueError, match="window"):
        # prompt 6 + 8 new > window 10: the window would activate mid-run
        spec.run([Request(rid=0, prompt=prompt, max_new_tokens=8)],
                 window=10)
    # a window the run never outgrows is fine — and still greedy-exact
    done = spec.run([Request(rid=0, prompt=prompt, max_new_tokens=4)],
                    window=16)
    plain = make_engine(cfg, params, "paged").generate(prompt, 4, window=16)
    assert done[0].tokens == plain


def test_int8_kv_no_kernel_chunked_matches_kernel(setup):
    """INT8 KV pages through the XLA-fallback attention (use_kernel=
    False) in CHUNKED decode: this trace was unreachable dead code with
    a missing import until round 3 — no test drove quant + no-kernel
    through decode_chunk_paged. Tokens must equal the kernel path's."""
    cfg, params, stream = setup
    page = PageConfig(page_size=8, num_pages=64, max_seqs=4,
                      pages_per_seq=8, kv_dtype="int8")
    prompts = [stream[i * 8:(i + 1) * 8].tolist() for i in range(3)]

    def run(use_kernel):
        econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                             max_batch=4, decode_chunk=4)
        eng = InferenceEngine(params, cfg, econf, use_kernel=use_kernel)
        done = eng.run([Request(rid=i, prompt=list(p), max_new_tokens=12)
                        for i, p in enumerate(prompts)])
        return {r.rid: r.tokens for r in done}

    assert run(False) == run(True)
