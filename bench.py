"""Benchmark entry point — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric: GPT-2 124M fp32 paged-decode throughput (tokens/sec/chip)
through the real engine loop (continuous batching, Pallas kernel, greedy),
batch=8, 128-token prompts, 128 new tokens each — BASELINE.json config 3
scaled to the chip.

vs_baseline: speedup over the reference's own baseline decode strategy
(infer.c: full-recompute sliding-window, batch=1) measured in this same
framework on this same chip — the reference repo publishes no decode
throughput numbers (BASELINE.md), so its *strategy* is the baseline.

Extra keys give the supporting measurements (not part of the contract).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from llmc_paged_tpu.config import EngineConfig, GPT2Config, PageConfig
    from llmc_paged_tpu.engine.engine import InferenceEngine
    from llmc_paged_tpu.engine.scheduler import Request
    from llmc_paged_tpu.models import gpt2

    cfg = GPT2Config.gpt2_124m()
    params = gpt2.init_params(cfg, jax.random.PRNGKey(0))
    params = gpt2.to_device(jax.tree.map(np.asarray, params), cfg)

    rng = np.random.default_rng(0)
    B, PROMPT, NEW = 8, 128, 128
    prompts = [rng.integers(0, cfg.vocab_size, PROMPT).astype(np.int32).tolist()
               for _ in range(B)]

    CHUNK = 32
    page = PageConfig(page_size=32, num_pages=B * 10 + 16, max_seqs=B,
                      pages_per_seq=10)
    econf = EngineConfig(cache_mode="paged", page=page, max_batch=B,
                         greedy=True, decode_chunk=CHUNK)
    engine = InferenceEngine(params, cfg, econf)

    # warmup: compiles prefill + every decode-chunk graph (CHUNK, CHUNK//4, 1)
    warm = [Request(rid=i, prompt=prompts[i],
                    max_new_tokens=CHUNK + CHUNK // 4 + 3)
            for i in range(B)]
    engine.run(warm)

    reqs = [Request(rid=i, prompt=prompts[i], max_new_tokens=NEW)
            for i in range(B)]
    done = engine.run(reqs)
    assert len(done) == B and all(len(r.generated) == NEW for r in done)
    paged_tok_s = engine.stats["decode_tok_per_s"]
    ttft = engine.stats["p50_ttft_s"]

    # baseline strategy: infer.c full-recompute sliding window, batch=1.
    # prompt == window so every step reruns a (1, PROMPT) forward (single
    # compiled shape).
    nocache_engine = InferenceEngine(params, cfg,
                                     EngineConfig(cache_mode="none",
                                                  greedy=True))
    nocache_engine.generate_nocache(prompts[0], 2, window=PROMPT)  # warmup
    steps = 12
    t0 = time.monotonic()
    nocache_engine.generate_nocache(prompts[0], steps, window=PROMPT)
    nocache_tok_s = steps / (time.monotonic() - t0)

    # supporting single-sequence paged number (same batch=1 as baseline)
    engine1 = InferenceEngine(params, cfg,
                              EngineConfig(cache_mode="paged", page=page,
                                           max_batch=1, greedy=True))
    engine1.generate_paged(prompts[0], 8)  # warmup
    t0 = time.monotonic()
    engine1.generate_paged(prompts[0], 64)
    paged1_tok_s = engine1.stats["decode_tok_per_s"]

    print(json.dumps({
        "metric": "gpt2_124m_fp32_paged_decode_tok_per_s_per_chip",
        "value": round(paged_tok_s, 2),
        "unit": "tokens/sec/chip",
        "vs_baseline": round(paged_tok_s / nocache_tok_s, 2),
        "detail": {
            "batch": B, "prompt_len": PROMPT, "new_tokens": NEW,
            "baseline_infer_c_strategy_tok_s_b1": round(nocache_tok_s, 2),
            "paged_b1_tok_s": round(paged1_tok_s, 2),
            "p50_ttft_s": round(ttft, 4),
            "device": str(jax.devices()[0]),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
