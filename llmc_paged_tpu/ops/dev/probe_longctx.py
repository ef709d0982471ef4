"""Long-context decode gap instrument (r5, VERDICT r4 #1).

One process, three measurements (the degraded relay pays one session
toll per process, so everything rides together):

1. EXACT replica of bench.py's long_ctx engine config (1.5B int8,
   prompt 896 + 128 new, pps=9 — byte-identical programs, so the
   bench warm run's compile cache is hit) but printing the engine's
   FULL stats dict: the t_* host-time buckets split the 11-12 ms/step
   into device time vs host dispatch/materialize overhead.
2. The same engine re-run (warm) to separate first-run effects.
3. The 124M chunk isolation matrix (prompt 128/896 x pool_mult 1/4/16,
   int8) — the decisive instrument for whether residual per-step cost
   scales with LIVE RANGE or POOL SIZE after the r5 commit-layout fix.

Run: python -m llmc_paged_tpu.ops.dev.probe_longctx [--skip-matrix]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-matrix", action="store_true")
    ap.add_argument("--skip-engine", action="store_true")
    args = ap.parse_args()

    from bench import (_cast_params, _model_cfg, _prompts, _run_requests,
                       _setup_jax, device_params)
    _setup_jax()
    import jax

    print(f"device: {jax.devices()[0]}", flush=True)

    if not args.skip_engine:
        from llmc_paged_tpu.config import EngineConfig, PageConfig
        from llmc_paged_tpu.engine.engine import InferenceEngine

        cfg = _model_cfg("1558m")
        B, CHUNK, LP, LN = 8, 32, 896, 128
        pps = -(-(LP + LN) // 128) + 1
        t0 = time.monotonic()
        params32 = device_params(cfg)
        page = PageConfig(page_size=128, num_pages=B * pps + 4,
                          max_seqs=B, pages_per_seq=pps, kv_dtype="int8")
        econf = EngineConfig(cache_mode="paged", page=page, max_batch=B,
                             greedy=True, decode_chunk=CHUNK,
                             param_dtype="int8",
                             activation_dtype="bfloat16",
                             prefill_param_dtype="bfloat16")
        eng = InferenceEngine(_cast_params(params32, cfg, "int8",
                                           "bfloat16"), cfg, econf)
        lprompts = _prompts(cfg, B, LP, seed=11)
        _run_requests(eng, lprompts, 4)            # compile/warm
        print(f"-- engine up ({time.monotonic() - t0:.0f}s) --",
              flush=True)
        for tag in ("run0", "run1"):
            t0 = time.monotonic()
            done = _run_requests(eng, lprompts, LN)
            wall = time.monotonic() - t0
            assert len(done) == B
            s = eng.stats
            nsteps = LN  # chunk steps per row == new tokens (greedy)
            print(f"== long_ctx {tag}: wall {wall:.2f}s "
                  f"decode {s['decode_tok_per_s']:.1f} tok/s "
                  f"(={B / s['decode_tok_per_s'] * 1e3:.2f} ms/step) ==",
                  flush=True)
            keys = sorted(k for k in s if k.startswith("t_"))
            print("   host buckets: "
                  + " ".join(f"{k}={s[k]:.3f}s" for k in keys), flush=True)
            print("   full stats: "
                  + " ".join(f"{k}={v}" for k, v in sorted(s.items())
                             if not k.startswith("t_")), flush=True)
        del eng

    if not args.skip_matrix:
        from llmc_paged_tpu.ops.dev.probe_decode import chunk_suite
        cfg124 = _model_cfg("124m")
        for prompt in (128, 896):
            for mult in (1, 4, 16):
                print(f"== chunk cell 124m prompt={prompt} "
                      f"pool_mult={mult} ==", flush=True)
                chunk_suite(8, cfg124, dtypes=("int8",), page_size=128,
                            prompt=prompt, pool_mult=mult)


if __name__ == "__main__":
    main()
