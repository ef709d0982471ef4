#!/usr/bin/env bash
# On-chip evidence harvester: runs the round's pending TPU measurements in
# PRIORITY order, each under its own timeout, appending everything to one
# raw log. Designed for a flaky relay window — if the relay dies mid-run,
# everything already harvested is on disk; rerun with a stage name to
# resume (stages are independent).
#
#   bash tools/tpu_evidence.sh              # all stages, priority order
#   bash tools/tpu_evidence.sh bench suite  # just those stages
#
# Stages (priority order — most valuable first for a short window):
#   sanity   device probe + flat-kernel compile probe (~2 min)
#   probe    1.5B decode-step breakdown: flat vs gridb kernel ring sweep,
#            the VERDICT r2 #3 kernel measurement (~15 min)
#   bench    full bench.py — the round's headline artifact (~10 min)
#   probe124 124M chunk/kernel breakdown (~8 min)
#   suite    on-chip pytest: the never-recorded engine/spec/prefix/
#            sharding/window suites first, then the rest (~25 min)
#   spec     spec-decode + prefix-cache rows at 1.5B (beyond bench's 124M
#            rows) (~10 min)
#
# NEVER run concurrently with other CPU-heavy jobs (1-core box: dispatch
# overhead inflates ~40x and every number is garbage).

set -uo pipefail
cd "$(dirname "$0")/.."
LOG="docs/tpu_evidence_$(date +%Y%m%d_%H%M%S).log"
echo "logging to $LOG"
run() {  # run <timeout_s> <label> <cmd...>
    local t="$1" label="$2"; shift 2
    echo "==== [$label] $(date -u +%FT%TZ) rev=$(git rev-parse --short HEAD) ====" | tee -a "$LOG"
    echo "\$ $*" | tee -a "$LOG"
    timeout "$t" "$@" 2>&1 | tee -a "$LOG"
    local rc=${PIPESTATUS[0]}
    echo "==== [$label] rc=$rc ====" | tee -a "$LOG"
    return 0
}

STAGES=${*:-sanity probe bench probe124 suite spec}

for s in $STAGES; do case "$s" in
sanity)
    run 180 sanity python -c "
import time, jax
t0 = time.monotonic()
print('devices:', jax.devices(), f'({time.monotonic()-t0:.1f}s)')
import jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
t0 = time.monotonic()
print('matmul:', float((x @ x).sum()), f'({time.monotonic()-t0:.1f}s)')
"
    # compile-probe every serving kernel variant at both bench head counts
    run 600 flat-probe python -c "
import sys; sys.path.insert(0, '.')
from bench import _setup_jax
_setup_jax()   # runs _probe_flat_kernel and reports fallback loudly
import os
print('LLMC_ATTN_VARIANT after probe:', os.environ.get('LLMC_ATTN_VARIANT', 'flat (default)'))
"
    ;;
probe)
    # A: chunk-step + serving-shape kernel isolation by kernel variant
    # (flat ring depth vs gridb) — the VERDICT r2 #3 number. Most
    # valuable first (flat4 is the default).
    run 2400 probe-1558 python -m llmc_paged_tpu.ops.dev.probe_decode \
        --model 1558m --skip gemv,kernel,matmul,prefill,attention,unrolled \
        --dtypes int8b:int8 --attn-variants flat4,flat8,gridb
    # B: page_size=256 — halves every per-page cost (DMA count, dot
    # count, table walks) at identical KV bytes for the bench shapes
    run 1800 probe-ps256 python -m llmc_paged_tpu.ops.dev.probe_decode \
        --model 1558m --skip gemv,kernel,matmul,prefill,attention,unrolled \
        --dtypes int8b:int8 --attn-variants flat4 --page-size 256
    # C: attention+scatter decomposition at int8 — where does the ~2.2ms
    # of non-matmul step time go? (scatteronly = KV quantize+write only,
    # attendonly = kernel only, stale = both without the write->read dep,
    # P2 = does cost scale with pool size)
    run 2400 probe-attn python -m llmc_paged_tpu.ops.dev.probe_decode \
        --model 1558m --skip gemv,kernel,matmul,prefill,chunk,unrolled \
        --dtypes int8,int8-attendonly,int8-scatteronly,int8-stale,int8-P2 \
        --attn-variants flat4
    ;;
bench)
    run 1500 bench env LLMC_BENCH_BUDGET_S=1200 python bench.py
    ;;
warm)
    # Fill the persistent XLA compile cache with EVERY program the
    # driver's end-of-round `python bench.py` will need (1.5B chunk
    # compiles are >10min cold — BENCH_r03's m1558 stage died on that),
    # then rehearse once under exact driver conditions (default budget).
    # Run this AFTER bench-affecting code is frozen for the round.
    run 3000 bench-warm env LLMC_BENCH_BUDGET_S=2700 python bench.py
    run 600 bench-rehearsal python bench.py
    ;;
probe124)
    run 1200 probe-124 python -m llmc_paged_tpu.ops.dev.probe_decode \
        --model 124m --skip gemv,matmul,prefill \
        --dtypes int8b:int8,bfloat16 --attn-variants flat4,gridb
    ;;
suite)
    # never-recorded-on-chip suites first (engine machinery under real
    # Mosaic), then the remainder for the full-suite record
    run 2400 suite-engine env LLMC_TEST_TPU=1 python -m pytest -q \
        tests/test_engine.py tests/test_spec_decode.py \
        tests/test_prefix_cache.py tests/test_window_reclaim.py \
        tests/test_sharding.py
    run 3000 suite-rest env LLMC_TEST_TPU=1 python -m pytest -q \
        tests/test_paged_attention.py tests/test_int8.py \
        tests/test_model_parity.py tests/test_block_manager.py \
        tests/test_formats.py tests/test_sampler.py tests/test_bf16.py \
        tests/test_train.py tests/test_quant_trained.py \
        tests/test_c_forward_parity.py tests/test_hf_import.py
    ;;
spec)
    run 1200 spec-1558 python - <<'EOF'
import sys, time
sys.path.insert(0, ".")
from bench import _Budget, _engine, _run_requests, _prompts, device_params, _setup_jax, _model_cfg
_setup_jax()
from llmc_paged_tpu.config import GPT2Config
cfg = GPT2Config.gpt2_1558m()
params32 = device_params(cfg)
B, PROMPT, NEW = 8, 128, 96
prompts = _prompts(cfg, B, PROMPT)
for spec_k, label in ((0, "plain"), (4, "spec_k=4")):
    eng = _engine(params32, cfg, param_dtype="int8", kv_dtype="int8",
                  B=B, CHUNK=8 if spec_k else 32, spec_k=spec_k)
    _run_requests(eng, prompts, 16)   # compile
    best = 0.0
    for _ in range(2):
        _run_requests(eng, prompts, NEW)
        best = max(best, eng.stats["decode_tok_per_s"])
    extra = (f" spec_tok_per_step={eng.stats['spec_tok_per_step']}"
             if spec_k else "")
    print(f"1.5B int8 {label}: {best:.1f} tok/s{extra}")
    del eng
EOF
    run 900 prefix-1558 python - <<'EOF'
import sys
sys.path.insert(0, ".")
from bench import _cast_params, _run_requests, device_params, _setup_jax
_setup_jax()
import numpy as np
from llmc_paged_tpu.config import EngineConfig, GPT2Config, PageConfig
from llmc_paged_tpu.engine.engine import InferenceEngine
cfg = GPT2Config.gpt2_1558m()
params32 = device_params(cfg)
B = 8
def make_prompts(seed):
    r = np.random.default_rng(seed)
    sysp = r.integers(0, cfg.vocab_size, 128).tolist()
    return [sysp + r.integers(0, cfg.vocab_size, 32).tolist()
            for _ in range(B)]
page = PageConfig(page_size=128, num_pages=B * 3 + 8, max_seqs=B,
                  pages_per_seq=4, kv_dtype="int8", prefix_cache=True)
econf = EngineConfig(cache_mode="paged", page=page, max_batch=B,
                     greedy=True, decode_chunk=32, param_dtype="int8",
                     activation_dtype="bfloat16",
                     prefill_param_dtype="bfloat16")
eng = InferenceEngine(_cast_params(params32, cfg, "int8", "bfloat16"),
                      cfg, econf)
pa = make_prompts(1)
_run_requests(eng, pa, 2); _run_requests(eng, pa, 2)   # compile both paths
pm = make_prompts(2)
_run_requests(eng, pm, 48); cold = dict(eng.stats)
_run_requests(eng, pm, 48); warm = dict(eng.stats)
print(f"1.5B int8 prefix-cache: cold p50 TTFT {cold['p50_ttft_s']:.4f}s, "
      f"warm {warm['p50_ttft_s']:.4f}s "
      f"(hit tokens {warm['prefix_hit_tokens']})")
EOF
    ;;
*) echo "unknown stage: $s" ;;
esac; done
echo "done -> $LOG"
