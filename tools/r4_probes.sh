#!/usr/bin/env bash
# Round-4 probe sequence for one relay window (run with a QUIET CPU).
set -u
cd "$(dirname "$0")/.."
LOG="docs/tpu_evidence_$(date +%Y%m%d_%H%M%S).log"
echo "logging to $LOG"
run() {
    local t="$1" label="$2"; shift 2
    echo "==== [$label] $(date -u +%FT%TZ) rev=$(git rev-parse --short HEAD) ====" | tee -a "$LOG"
    echo "\$ $*" | tee -a "$LOG"
    timeout "$t" "$@" 2>&1 | tee -a "$LOG"
    echo "==== [$label] rc=${PIPESTATUS[0]} ====" | tee -a "$LOG"
    return 0
}
# A: flatwide chunk + kernel isolation vs flat4 (flat4 chunk is warm-cached)
run 2400 probe-flatwide python -m llmc_paged_tpu.ops.dev.probe_decode \
    --model 1558m --skip gemv,kernel,matmul,prefill,attention,unrolled \
    --dtypes int8b:int8 --attn-variants flat4,flatwide
# B: page_size=256 hypothesis
run 1800 probe-ps256 python -m llmc_paged_tpu.ops.dev.probe_decode \
    --model 1558m --skip gemv,kernel,matmul,prefill,attention,unrolled \
    --dtypes int8b:int8 --attn-variants flat4,flatwide --page-size 256
# C: where does the non-matmul time go (attend vs scatter vs dep)
run 2400 probe-attn python -m llmc_paged_tpu.ops.dev.probe_decode \
    --model 1558m --skip gemv,kernel,matmul,prefill,chunk,unrolled \
    --dtypes int8,int8-attendonly,int8-scatteronly,int8-stale,int8-P2 \
    --attn-variants flat4
echo "done -> $LOG"
