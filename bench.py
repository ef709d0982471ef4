"""Benchmark entry point — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric: GPT-2 124M paged-decode throughput (tokens/sec/chip)
through the real engine loop (continuous batching, Pallas paged-attention
kernel, async chunk chaining, greedy), batch=8, 128-token prompts,
128 new tokens each — BASELINE.json config 3 scaled to the chip — at the
fastest serving dtype; the per-dtype sweep (fp32 parity mode, bf16, int8
weights+KV) is in detail.

Robustness contract (VERDICT r2 #1: BENCH_r02 timed out with nothing
printed): this process is a thin ORCHESTRATOR that never imports jax.
Each measurement group runs in a SUBPROCESS with its own wall-clock
share of the total budget (LLMC_BENCH_BUDGET_S, default 480s); children
print a cumulative JSON line after every substage, so even a SIGKILL
mid-compile only loses the in-flight substage. The orchestrator emits
the single headline JSON line on completion, on budget exhaustion, and
on SIGTERM/SIGINT — whichever comes first. Stages that could not run are
reported in detail as "skipped"/"timeout", never by silence.

Measured rows (beyond the headline sweep):
  gpt2_1558m       — north-star model, int8 + bf16, B=8, with roofline frac
  gpt2_1558m_b32   — 1.5B int8 through the real engine at B=32
  loaded_queue     — 16 mixed-length requests through 8 slots, at int8
                     (the headline dtype), chunked decode under pressure
  parity_sampling  — config-3 with the bit-exact xorshift sampler (one
                     host sync per token by design; this row records what
                     that parity mode costs)
  pool_fill        — max concurrent seqs per GB MEASURED by admitting
                     256-token sequences until the page pool binds
                     (previously computed analytically only)
  spec_decode      — speculative decoding (spec_k=4, greedy-exact device
                     n-gram drafting) at int8: tok/s + accepted tokens per
                     verify step on this workload
  prefix_cache     — content-addressed prefix caching at int8: p50 TTFT
                     of a wave sharing a 128-token system prefix, cold
                     (nothing cached) vs warm (prefix pages adopted,
                     suffix-only prefill)
  parity_ps32      — page_size=32 (the reference's BLOCK_SIZE) fp32
                     serving: below the DMA kernel's 128-lane floor, so
                     this records what the grid-kernel parity config costs

vs_baseline: speedup over the reference's own baseline decode strategy
(infer.c: full-recompute sliding-window, batch=1, fp32) measured in this
same framework on this same chip — the reference repo publishes no decode
throughput numbers (BASELINE.md), so its *strategy* is the baseline.

All params are generated ON DEVICE (jax.random under jit) — the r2 bench
pulled ~6GB of 1.5B fp32 through the relay tunnel and pushed it back,
which is the likely cause of the driver timeout.
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
HBM_GBPS = 819e9   # v5e HBM bandwidth (How to Scale Your Model, v5e spec)

# Fallback for vs_baseline when the in-run baseline substage could not
# run: the same strategy measured on this chip (round 4 measured it at
# 30.6-32.6 tok/s; the HIGHEST value is used so a fallback can only
# understate the speedup, never inflate it) — docs/TPU_RUNS.md.
BASELINE_FALLBACK_TOK_S = 32.56


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


# ===================== stage machinery (child side) =====================

class _Budget:
    """Per-child deadline; substages skip themselves when their estimated
    cost no longer fits."""

    def __init__(self, deadline: float):
        self.deadline = deadline

    def left(self) -> float:
        return self.deadline - time.monotonic()

    def fits(self, est_s: float) -> bool:
        return self.left() >= est_s


def _setup_jax():
    sys.path.insert(0, REPO)
    if os.environ.get("LLMC_PLATFORM") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    from llmc_paged_tpu.utils import enable_compile_cache
    enable_compile_cache()
    _probe_flat_kernel()


def _probe_flat_kernel():
    """Compile-probe the flat serving kernels on the real backend; fall
    back to the (B,)-grid variant if Mosaic rejects any of them. Keeps a
    kernel regression from zeroing the whole bench (the engine would
    otherwise hit the compile error mid-stage). Probes BOTH the float
    and the int8 kernel at the bench's real head counts (12 = 124M,
    25 = 1.5B — a non-8-multiple NH is exactly where Mosaic layout
    rules bite) with the default ring depth."""
    import jax
    if jax.default_backend() != "tpu" or \
            os.environ.get("LLMC_ATTN_VARIANT") == "gridb":
        return
    import jax.numpy as jnp
    from llmc_paged_tpu.ops import paged_attention as pa
    try:
        for NH in (12, 25):
            B, HS, P, ps = 8, 64, 26, 128
            kv = jnp.zeros((P, NH, HS, ps), jnp.float32)
            kvb = jnp.zeros((P, NH, HS, ps), jnp.bfloat16)
            kvq = jnp.zeros((P, NH, HS, ps), jnp.int8)
            sc = jnp.ones((P, NH, ps), jnp.float32)
            tables = jnp.zeros((B, 3), jnp.int32)
            lengths = jnp.ones(B, jnp.int32)
            # BOTH compute paths per kernel: f32 q (parity mode) and
            # bf16 q — the dtype the serving engine actually passes
            # (it selects the bf16 single-pass dot branch, a different
            # Mosaic program; dd1a116 exists because that branch hit
            # layout rejections f32 never did)
            for qdt in (jnp.float32, jnp.bfloat16):
                q = jnp.zeros((B, NH, HS), qdt)
                out = pa.paged_decode_attention_parts(
                    q, kvb if qdt == jnp.bfloat16 else kv,
                    kvb if qdt == jnp.bfloat16 else kv, tables, lengths)
                # value FETCH, not block_until_ready: the relay's
                # block_until_ready returns with the program in flight,
                # so a Mosaic rejection would otherwise surface later,
                # mid-stage — exactly what this probe exists to prevent
                float(jnp.sum(out[0]))
                out = pa.paged_decode_attention_quant_parts(
                    q, kvq, kvq, sc, sc, tables, lengths)
                float(jnp.sum(out[0]))
    except Exception as e:   # pragma: no cover - chip-only path
        _log(f"flat kernel probe FAILED ({type(e).__name__}); "
             f"falling back to gridb")
        os.environ["LLMC_ATTN_VARIANT"] = "gridb"
        jax.clear_caches()   # jit caches ignore env vars — drop traces


def _smoke() -> bool:
    return bool(os.environ.get("LLMC_BENCH_SMOKE"))


def _model_cfg(which: str):
    from llmc_paged_tpu.config import GPT2Config
    if _smoke():
        return GPT2Config.tiny(max_seq_len=512, vocab_size=512,
                               num_layers=2, num_heads=2, channels=128)
    return {"124m": GPT2Config.gpt2_124m,
            "1558m": GPT2Config.gpt2_1558m}[which]()


def device_params(cfg):
    """fp32 params generated ON DEVICE — never pulled to the host."""
    import jax
    from llmc_paged_tpu.models import gpt2
    params = gpt2.init_params(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    return params


def _cast_params(params32, cfg, param_dtype: str, activation_dtype: str):
    """Device-side cast to a serving dtype (the engine's own np-input
    conversion, done here because we hand it a device pytree)."""
    import jax.numpy as jnp
    from llmc_paged_tpu.models import gpt2
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
             "int8": {"float32": jnp.float32,
                      "bfloat16": jnp.bfloat16}[activation_dtype],
             }[param_dtype]
    return gpt2.to_device(params32, cfg, dtype)


def _engine(params32, cfg, *, param_dtype, kv_dtype, B, CHUNK,
            num_pages=None, pages_per_seq=3, greedy=True,
            top_k=None, temperature=1.0, page_size=128, spec_k=0):
    from llmc_paged_tpu.config import EngineConfig, PageConfig
    from llmc_paged_tpu.engine.engine import InferenceEngine
    act = "bfloat16" if param_dtype == "int8" else "float32"
    page = PageConfig(page_size=page_size,
                      num_pages=(B * 3 + 4 if num_pages is None else num_pages),
                      max_seqs=B, pages_per_seq=pages_per_seq,
                      kv_dtype=kv_dtype)
    econf = EngineConfig(cache_mode="paged", page=page, max_batch=B,
                         greedy=greedy, decode_chunk=CHUNK, spec_k=spec_k,
                         param_dtype=param_dtype, activation_dtype=act,
                         top_k=top_k, temperature=temperature,
                         # prefill is compute-bound: serve it from a bf16
                         # weight copy; decode stays on int8 (bandwidth)
                         prefill_param_dtype=("bfloat16"
                                              if param_dtype == "int8"
                                              else None))
    dev = _cast_params(params32, cfg, param_dtype, act)
    return InferenceEngine(dev, cfg, econf)


def _run_requests(engine, prompts, NEW):
    from llmc_paged_tpu.engine.scheduler import Request
    reqs = [Request(rid=i, prompt=list(p), max_new_tokens=NEW)
            for i, p in enumerate(prompts)]
    done = engine.run(reqs)
    return done


def run_paged(params32, cfg, B, prompts, NEW, CHUNK, param_dtype, kv_dtype,
              budget: "_Budget", warmups=2, runs=2):
    t0 = time.monotonic()
    engine = _engine(params32, cfg, param_dtype=param_dtype,
                     kv_dtype=kv_dtype, B=B, CHUNK=CHUNK)
    _log(f"  engine init {time.monotonic() - t0:.0f}s")
    # warmup 1 compiles prefill + decode-chunk; warmup 2 smooths relay
    # first-use effects. Under a tight/slow-relay budget drop to one
    # warmup — getting SOME measured run out beats a smoother one (the
    # relay's per-dispatch latency was observed to degrade 2-3x within a
    # session while throughput stayed intact; see docs/TPU_RUNS.md r4).
    warm_new = min(NEW, CHUNK + 3)
    if not budget.fits(160):
        warmups = min(warmups, 1)
    for i in range(warmups):
        t0 = time.monotonic()
        _run_requests(engine, prompts, warm_new)
        _log(f"  warmup{i} {time.monotonic() - t0:.0f}s")
        if not budget.fits(10):
            break
    best, all_runs = None, []
    for i in range(runs):
        t0 = time.monotonic()
        done = _run_requests(engine, prompts, NEW)
        _log(f"  run{i} {time.monotonic() - t0:.0f}s")
        assert len(done) == B and all(len(r.generated) == NEW for r in done)
        all_runs.append(round(engine.stats["decode_tok_per_s"], 2))
        if best is None or engine.stats["decode_tok_per_s"] > \
                best["decode_tok_per_s"]:
            best = dict(engine.stats)
        if not budget.fits(10):
            break
    best["runs"] = all_runs
    best["param_bytes"] = _param_bytes(engine.params)
    del engine
    return best


def _param_bytes(params) -> int:
    import jax
    import numpy as np
    return int(sum(int(np.prod(v.shape)) * v.dtype.itemsize
                   for v in jax.tree.leaves(params)))


def _kv_bytes_per_token(cfg, kv_dtype: str) -> float:
    kv_b = {"float32": 8.0, "bfloat16": 4.0,
            "int8": 2.0 + 8.0 / cfg.head_dim}[kv_dtype]
    return cfg.num_layers * cfg.num_heads * cfg.head_dim * kv_b


def _prompts(cfg, B, n, seed=0):
    import numpy as np
    rng = np.random.default_rng(seed)
    return [rng.integers(0, cfg.vocab_size, n).astype(np.int32).tolist()
            for _ in range(B)]


class _Partial:
    """Cumulative child output: one JSON line per completed substage, so
    the parent always has the latest state even if this process dies."""

    def __init__(self):
        self.out = {}

    def emit(self):
        print(json.dumps(self.out), flush=True)

    def sub(self, name, fn, budget, est_s):
        if not budget.fits(est_s):
            self.out[name] = {"skipped": f"budget ({budget.left():.0f}s "
                              f"left < {est_s}s est)"}
            _log(f"substage {name}: skipped ({budget.left():.0f}s left)")
        else:
            t0 = time.monotonic()
            _log(f"substage {name}: start ({budget.left():.0f}s left)")
            try:
                self.out[name] = fn()
                self.out[name]["elapsed_s"] = round(time.monotonic() - t0, 1)
            except Exception as e:   # pragma: no cover - diagnostics
                self.out[name] = {"error": f"{type(e).__name__}: {e}"}
            _log(f"substage {name}: {time.monotonic() - t0:.0f}s")
        self.emit()


# ------------------------------ stage m124 ------------------------------

def stage_m124(budget: _Budget):
    _setup_jax()
    import jax

    from llmc_paged_tpu.config import EngineConfig
    from llmc_paged_tpu.engine.engine import InferenceEngine
    from llmc_paged_tpu.sampler import Sampler

    cfg = _model_cfg("124m")
    B, PROMPT, NEW, CHUNK = 8, 128, 128, 64
    if _smoke():
        PROMPT, NEW, CHUNK = 32, 24, 8
    params32 = device_params(cfg)
    prompts = _prompts(cfg, B, PROMPT)
    part = _Partial()
    part.out["device"] = str(jax.devices()[0])
    part.out["backend"] = jax.default_backend()
    part.out["batch"], part.out["prompt_len"] = B, PROMPT
    part.out["new_tokens"] = NEW
    part.out["sweep"] = {}

    # headline sweep, best dtype first so a budget cut keeps the headline;
    # the first dtype runs UNCONDITIONALLY (est 0) — an attempted headline
    # beats a guaranteed-zero one even under a starved budget
    for j, name in enumerate(("int8", "bfloat16", "float32")):
        def one(name=name):
            stats = run_paged(params32, cfg, B, prompts, NEW, CHUNK,
                              name, name, budget)
            bpt = _kv_bytes_per_token(cfg, name)
            return {"tok_s": round(stats["decode_tok_per_s"], 2),
                    "p50_ttft_s": round(stats["p50_ttft_s"], 4),
                    "runs": stats["runs"],
                    "kv_bytes_per_token": int(bpt),
                    "max_seqs_256tok_per_gb": int(2**30 / (bpt * 256))}
        part.sub(f"sweep.{name}", lambda one=one: one(), budget,
                 est_s=0 if j == 0 else (20 if _smoke() else 45))
        if f"sweep.{name}" in part.out:   # flatten into sweep dict
            part.out["sweep"][name] = part.out.pop(f"sweep.{name}")
            part.emit()

    # reference-strategy baseline: infer.c full-recompute sliding window
    def baseline():
        dev = _cast_params(params32, cfg, "float32", "float32")
        nocache = InferenceEngine(dev, cfg,
                                  EngineConfig(cache_mode="none", greedy=True))
        nocache.generate_nocache(prompts[0], 2, window=PROMPT)  # warmup
        steps = 4 if _smoke() else 12
        t0 = time.monotonic()
        nocache.generate_nocache(prompts[0], steps, window=PROMPT)
        return {"tok_s": round(steps / (time.monotonic() - t0), 2),
                "strategy": "infer.c full-recompute window, B=1, fp32"}
    # warm-measured 2.5-6.7s; an inflated estimate skipped it in a run
    # that had 36s left (the in-run baseline beats the fallback constant)
    part.sub("baseline_infer_c", baseline, budget, est_s=10 if _smoke() else 15)

    # loaded queue AT THE HEADLINE DTYPE (VERDICT r2 weak #4: was bf16-only)
    def loaded():
        import numpy as np
        rng = np.random.default_rng(3)
        lens = rng.integers(32, PROMPT + 64, 16).tolist()
        qprompts = [rng.integers(0, cfg.vocab_size, int(n)).astype(np.int32)
                    .tolist() for n in lens]
        engine = _engine(params32, cfg, param_dtype="int8", kv_dtype="int8",
                         B=B, CHUNK=CHUNK, num_pages=B * 3 + 6)
        best = 0.0
        n_runs = 2 if _smoke() else 3
        for i in range(n_runs):   # first run also compiles odd buckets
            done = _run_requests(engine, qprompts, NEW)
            assert len(done) == 16
            best = max(best, engine.stats["decode_tok_per_s"])
            if not budget.fits(15):
                break
        return {"tok_s": round(best, 2), "n_requests": 16, "slots": B,
                "dtype": "int8", "prompt_lens": f"32-{PROMPT + 64}"}
    part.sub("loaded_queue", loaded, budget, est_s=25 if _smoke() else 70)

    # parity (xorshift) sampling under load: config-3 semantics, one host
    # sync per token BY DESIGN (the RNG stream is host state) — this row
    # records the measured cost of that mode (VERDICT r2 weak #6/#8)
    def parity():
        engine = _engine(params32, cfg, param_dtype="float32",
                         kv_dtype="float32", B=B, CHUNK=CHUNK, greedy=False)
        n_new = 6 if _smoke() else 24
        _run_requests(engine, prompts, 2)   # compile single-token path
        done = _run_requests(engine, prompts, n_new)
        assert len(done) == B
        return {"tok_s": round(engine.stats["decode_tok_per_s"], 2),
                "sampler": "xorshift parity (host, 1 sync/token)",
                "new_tokens": n_new}
    part.sub("parity_sampling", parity, budget,
             est_s=20 if _smoke() else 35)

    # speculative decoding (greedy-exact device n-gram drafting, engine
    # spec_k): config-3 shapes at the headline dtype. tok/s here rides
    # spec_tok_per_step, which depends on how repetitive the generated
    # stream is — random-INIT greedy generations loop, so treat this as
    # the mechanism's measured behavior on THIS workload, not a universal
    # speedup (the plain int8 sweep row above is the general number).
    def spec_decode():
        S = 8 if _smoke() else 16
        # pages_per_seq=3 leaves headroom for the S*spec_k reservation, so
        # spec stays engaged through the whole 256-token run
        engine = _engine(params32, cfg, param_dtype="int8", kv_dtype="int8",
                         B=B, CHUNK=S, spec_k=4)
        n_runs = 2 if _smoke() else 3
        best = None
        for _ in range(n_runs):
            done = _run_requests(engine, prompts, NEW)
            assert len(done) == B
            if best is None or engine.stats["decode_tok_per_s"] > \
                    best["decode_tok_per_s"]:
                best = dict(engine.stats)
            if not budget.fits(15):
                break
        return {"tok_s": round(best["decode_tok_per_s"], 2),
                "spec_tok_per_step": best["spec_tok_per_step"],
                "spec_k": 4, "dtype": "int8",
                "note": "greedy-exact; gain tracks stream repetitiveness"}
    part.sub("spec_decode", spec_decode, budget, est_s=25 if _smoke() else 60)

    # prefix caching (PageConfig.prefix_cache): 8 requests sharing a
    # 128-token system prefix (exactly one 128-token page) + distinct
    # tails. Cold wave prefills everything; the warm wave adopts the
    # cached page chain and prefills only the tails — the TTFT delta is
    # the measured value of the feature.
    def prefix_cache():
        import numpy as np
        from llmc_paged_tpu.config import EngineConfig, PageConfig
        from llmc_paged_tpu.engine.engine import InferenceEngine
        rng = np.random.default_rng(9)
        ps = 128 if not _smoke() else 16
        sys_len, tail = ps, 32 if not _smoke() else 8

        def make_prompts(seed):
            r = np.random.default_rng(seed)
            sysp = r.integers(0, cfg.vocab_size, sys_len).tolist()
            return [sysp + r.integers(0, cfg.vocab_size, tail).tolist()
                    for _ in range(B)]

        page = PageConfig(page_size=ps, num_pages=B * 3 + 8, max_seqs=B,
                          pages_per_seq=4, kv_dtype="int8",
                          prefix_cache=True)
        econf = EngineConfig(cache_mode="paged", page=page, max_batch=B,
                             greedy=True, decode_chunk=CHUNK,
                             param_dtype="int8",
                             activation_dtype="bfloat16",
                             prefill_param_dtype="bfloat16")
        engine = InferenceEngine(
            _cast_params(params32, cfg, "int8", "bfloat16"), cfg, econf)
        n_new = NEW // 2
        pa = make_prompts(1)
        _run_requests(engine, pa, 2)    # compiles the plain-prefill path
        _run_requests(engine, pa, 2)    # adopts pa pages -> compiles the
        #                                 suffix-prefill path
        # COLD: fresh content (cache cannot match); WARM: same content
        prompts_m = make_prompts(2)
        _run_requests(engine, prompts_m, n_new)
        cold = dict(engine.stats)
        _run_requests(engine, prompts_m, n_new)
        warm = dict(engine.stats)
        assert warm["prefix_hit_tokens"] > 0
        return {"cold_p50_ttft_s": round(cold["p50_ttft_s"], 4),
                "warm_p50_ttft_s": round(warm["p50_ttft_s"], 4),
                "warm_hit_tokens": warm["prefix_hit_tokens"],
                "warm_tok_s": round(warm["decode_tok_per_s"], 2),
                "shared_prefix": sys_len, "dtype": "int8"}
    part.sub("prefix_cache", prefix_cache, budget,
             est_s=20 if _smoke() else 50)

    # parity-CONFIG serving cost (VERDICT r2 weak #7): page_size=32 — the
    # reference's BLOCK_SIZE — is below the manual-DMA kernel's 128-lane
    # alignment floor and dispatches to the grid kernel (~10x off
    # streaming). This row records what that correctness-first config
    # costs; lowest priority, runs only when budget remains.
    def parity_ps32():
        n_new = 8 if _smoke() else 32
        ps32 = 8 if _smoke() else 32
        pps = -(-(PROMPT + n_new) // ps32) + 1
        engine = _engine(params32, cfg, param_dtype="float32",
                         kv_dtype="float32", B=B, CHUNK=min(CHUNK, 16),
                         num_pages=B * pps + 4, pages_per_seq=pps,
                         page_size=ps32)
        _run_requests(engine, prompts, 2)   # compile
        done = _run_requests(engine, prompts, n_new)
        assert len(done) == B
        return {"tok_s": round(engine.stats["decode_tok_per_s"], 2),
                "page_size": ps32, "kernel": "gridb fallback (ps<128)",
                "dtype": "float32 parity config"}
    part.sub("parity_ps32", parity_ps32, budget,
             est_s=25 if _smoke() else 60)

    # MEASURED max concurrent seqs per GB: admit 256-token sequences into
    # a pool deliberately smaller than the slot count until pages bind
    def pool_fill():
        num_pages = 12          # 6 concurrent 2-page sequences < 8 slots
        n_reqs = 12
        p_len, n_new = 128, 128   # 256 tokens = exactly 2 pages of 128
        if _smoke():
            p_len, n_new = 32, 32
        engine = _engine(params32, cfg, param_dtype="int8", kv_dtype="int8",
                         B=B, CHUNK=32, num_pages=num_pages)
        fprompts = _prompts(cfg, n_reqs, p_len, seed=7)
        done = _run_requests(engine, fprompts, n_new)
        assert len(done) == n_reqs
        peak_pages = engine.stats["peak_pages_used"]
        pool_gb = (num_pages * 128 * _kv_bytes_per_token(cfg, "int8")
                   / 2**30)
        concurrent = peak_pages // 2   # 2 pages per 256-token sequence
        return {"peak_pages_used": int(peak_pages),
                "pool_gb": round(pool_gb, 4),
                "concurrent_256tok_seqs": int(concurrent),
                "measured_seqs_256tok_per_gb": int(concurrent / pool_gb),
                "preemptions": engine.stats["preemptions"]}
    part.sub("pool_fill", pool_fill, budget,
             est_s=20 if _smoke() else 180)   # warm-measured 178.7s (51
    #                                           preemption re-prefills)

    part.emit()


# ------------------------------ stage m1558 -----------------------------

def stage_m1558(budget: _Budget):
    _setup_jax()
    cfg = _model_cfg("1558m")
    B, PROMPT, NEW, CHUNK = 8, 128, 128, 32
    if _smoke():
        PROMPT, NEW, CHUNK = 32, 24, 8
    params32 = device_params(cfg)
    prompts = _prompts(cfg, B, PROMPT)
    part = _Partial()
    for name in ("int8", "bfloat16"):
        def one(name=name):
            stats = run_paged(params32, cfg, B, prompts, NEW, CHUNK,
                              name, name, budget)
            tok_s = stats["decode_tok_per_s"]
            step_s = B / tok_s if tok_s else float("inf")
            pb = stats["param_bytes"]
            kvb = _kv_bytes_per_token(cfg, name) * (PROMPT + NEW / 2)
            roofline_s = (pb + kvb * B) / HBM_GBPS
            return {"tok_s": round(tok_s, 2),
                    "p50_ttft_s": round(stats["p50_ttft_s"], 4),
                    "runs": stats["runs"], "param_bytes": pb,
                    "roofline_frac": round(roofline_s / step_s, 4)}
        part.sub(name, lambda one=one: one(), budget,
                 est_s=30 if _smoke() else (120 if name == "int8" else 60))

    # long context: 896-token prompts + 128 new = 8 pages/seq of live KV
    # per row — the regime the paged design exists for (live-KV bytes
    # rival the weight stream; the r4 kernel reworks scale with them)
    def long_ctx():
        LP, LN = (64, 16) if _smoke() else (896, 128)
        pps = -(-(LP + LN) // 128) + (0 if _smoke() else 1)
        lprompts = _prompts(cfg, B, LP, seed=11)
        from llmc_paged_tpu.config import EngineConfig, PageConfig
        from llmc_paged_tpu.engine.engine import InferenceEngine
        page = PageConfig(page_size=128, num_pages=B * pps + 4, max_seqs=B,
                          pages_per_seq=pps, kv_dtype="int8")
        econf = EngineConfig(cache_mode="paged", page=page, max_batch=B,
                             greedy=True, decode_chunk=CHUNK,
                             param_dtype="int8",
                             activation_dtype="bfloat16",
                             prefill_param_dtype="bfloat16")
        eng = InferenceEngine(_cast_params(params32, cfg, "int8",
                                           "bfloat16"), cfg, econf)
        _run_requests(eng, lprompts, 4)    # compile
        best = 0.0
        for _ in range(2):
            done = _run_requests(eng, lprompts, LN)
            assert len(done) == B
            best = max(best, eng.stats["decode_tok_per_s"])
            if not budget.fits(30):
                break
        return {"tok_s": round(best, 2), "prompt_len": LP,
                "new_tokens": LN, "pages_per_seq": pps, "dtype": "int8",
                "p50_ttft_s": round(eng.stats["p50_ttft_s"], 4)}
    # warm-measured 25.3s (the cold-compile 96s run was the outlier)
    part.sub("long_ctx", long_ctx, budget, est_s=20 if _smoke() else 40)
    part.emit()


def stage_m1558_b32(budget: _Budget):
    _setup_jax()
    cfg = _model_cfg("1558m")
    B, PROMPT, NEW, CHUNK = 32, 128, 64, 32
    if _smoke():
        PROMPT, NEW, CHUNK = 32, 16, 8
    params32 = device_params(cfg)
    prompts = _prompts(cfg, B, PROMPT)
    part = _Partial()

    def one():
        stats = run_paged(params32, cfg, B, prompts, NEW, CHUNK,
                          "int8", "int8", budget, warmups=1, runs=2)
        return {"tok_s": round(stats["decode_tok_per_s"], 2),
                "p50_ttft_s": round(stats["p50_ttft_s"], 4),
                "runs": stats["runs"], "batch": B, "new_tokens": NEW}
    part.sub("int8", one, budget, est_s=40 if _smoke() else 120)
    part.emit()


def stage_probe(budget: _Budget):
    """Relay-health probe: time ONE trivial dispatch THROUGH A VALUE
    FETCH. The orchestrator uses this to detect the degraded-relay regime
    BENCH_r04 died in (first-VALUE-FETCH latency 200-380s in the driver's
    window while steady throughput stayed intact) and collapse the plan
    to a single last-resort headline attempt instead of letting every
    stage burn its budget on init (VERDICT r4 next-step #2).

    Measured r5: on this relay build `block_until_ready` NEVER syncs —
    it returns in <1ms with the program still in flight — and the
    degraded-window cost lands on the first value fetch. A probe that
    only dispatches reads ~0s in exactly the regime it exists to catch,
    so the probe must round-trip a value."""
    sys.path.insert(0, REPO)
    if os.environ.get("LLMC_PLATFORM") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    t0 = time.monotonic()
    x = jnp.ones((128, 128), jnp.bfloat16)
    v = float((x @ x)[0, 0])          # fetch forces real execution
    print(json.dumps({"dispatch_s": round(time.monotonic() - t0, 1),
                      "check": v, "device": str(jax.devices()[0])}),
          flush=True)


def stage_m124_lastresort(budget: _Budget):
    """Degraded-relay headline: ONE engine (124M int8 — the headline
    config), one warmup, one measured run, nothing else. Run when the
    relay probe says first-dispatch latency would starve the normal
    multi-substage plan; gets the whole remaining budget."""
    _setup_jax()
    import jax
    cfg = _model_cfg("124m")
    B, PROMPT, NEW, CHUNK = 8, 128, 64, 64
    if _smoke():
        PROMPT, NEW, CHUNK = 32, 16, 8
    params32 = device_params(cfg)
    prompts = _prompts(cfg, B, PROMPT)
    part = _Partial()
    part.out["device"] = str(jax.devices()[0])
    part.out["backend"] = jax.default_backend()
    part.out["batch"], part.out["prompt_len"] = B, PROMPT
    part.out["new_tokens"] = NEW
    part.out["mode"] = "last-resort (degraded relay)"
    part.out["sweep"] = {}
    bpt = _kv_bytes_per_token(cfg, "int8")
    hold = {}

    def one_run():
        if "eng" not in hold:
            t0 = time.monotonic()
            hold["eng"] = _engine(params32, cfg, param_dtype="int8",
                                  kv_dtype="int8", B=B, CHUNK=CHUNK)
            # short warmup: absorbs the degraded relay's first-VALUE-FETCH
            # toll (~200-400s observed) AND the compile-cache dispatches,
            # so the measured rows below are clean
            _run_requests(hold["eng"], prompts, min(NEW, CHUNK + 3))
            _log(f"  init+warm {time.monotonic() - t0:.0f}s")
        _run_requests(hold["eng"], prompts, NEW)
        s = hold["eng"].stats
        return {"tok_s": round(s["decode_tok_per_s"], 2),
                "p50_ttft_s": round(s["p50_ttft_s"], 4),
                "kv_bytes_per_token": int(bpt),
                "max_seqs_256tok_per_gb": int(2**30 / (bpt * 256))}

    # One row per measured run, each flushed into the cumulative partial
    # the moment it lands: a driver kill mid-attempt still leaves the
    # best earlier row (BENCH_r04's failure mode was toll + one long
    # substage = zero rows in the whole budget).
    runs = []
    for i in range(3):
        name = f"attempt{i}"
        part.sub(name, one_run, budget, est_s=0 if i == 0 else 25)
        row = part.out.pop(name, None)
        if not isinstance(row, dict) or "tok_s" not in row:
            part.out[name] = row     # keep the error/skip record visible
            break                    # engine broken or budget exhausted
        runs.append(row["tok_s"])
        cur = part.out["sweep"].get("int8")
        if cur is None or row["tok_s"] > cur.get("tok_s", 0):
            part.out["sweep"]["int8"] = row
        part.out["sweep"]["int8"]["runs"] = list(runs)
        part.emit()


STAGES = {"m124": stage_m124, "m1558": stage_m1558,
          "m1558_b32": stage_m1558_b32, "probe": stage_probe,
          "m124_lastresort": stage_m124_lastresort}


# ===================== orchestrator (parent side) ========================

_LIVE_CHILD = [None]   # current stage Popen, killed by the signal handler


def _measured_rows(obj) -> int:
    """Count substages that actually produced a measurement (every
    successful _Partial.sub result carries elapsed_s). A stage whose
    substages ALL skipped must not read as ok (VERDICT r4 weak #1:
    m1558_b32 reported \"ok\" with zero measured rows)."""
    if not isinstance(obj, dict):
        return 0
    n = 1 if "elapsed_s" in obj else 0
    return n + sum(_measured_rows(v) for v in obj.values())


def _run_child(name: str, timeout_s: float):
    """Run one stage subprocess; return (status, dict-or-None). The child
    prints a cumulative JSON line per substage; we keep the last parseable
    one, so a timeout/kill only loses the in-flight substage."""
    _log(f"stage {name}: timeout {timeout_s:.0f}s")
    p = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--stage", name,
         "--deadline-in", str(max(timeout_s - 10.0, 15.0))],
        stdout=subprocess.PIPE, stderr=sys.stderr, text=True, cwd=REPO)
    _LIVE_CHILD[0] = p
    status = "ok"
    try:
        out, _ = p.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        status = "timeout"
        p.terminate()           # child may flush a last partial line
        try:
            out, _ = p.communicate(timeout=20)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
    if p.returncode not in (0, None) and status == "ok":
        status = f"rc={p.returncode}"
    parsed = None
    for line in (out or "").splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                pass
    _LIVE_CHILD[0] = None
    if status == "ok" and name != "probe" and _measured_rows(parsed) == 0:
        status = "ok_no_rows"
    _log(f"stage {name}: {status}")
    return status, parsed


def main():
    t0 = time.monotonic()
    # 540s default: BENCH_r03 proved the driver tolerates 480s; the
    # SIGTERM/partial-line machinery means even a driver kill at ~600s
    # still captures the headline, so the extra 60s buys the b32/extra
    # rows at low risk (r02's failure mode was NO line, not rc!=0).
    budget = float(os.environ.get("LLMC_BENCH_BUDGET_S",
                                  "240" if _smoke() else "540"))
    reserve = 10.0   # orchestrator tail (emit + margin)
    detail = {"stages": {}}
    emitted = [False]

    def emit(final=False):
        if emitted[0]:
            return
        emitted[0] = True
        sweep = detail.get("sweep") or {}
        usable = {k: v for k, v in sweep.items() if "tok_s" in v}
        headline_dtype = (max(usable, key=lambda k: usable[k]["tok_s"])
                          if usable else None)
        value = usable[headline_dtype]["tok_s"] if headline_dtype else 0.0
        base = (detail.get("baseline_infer_c") or {}).get("tok_s")
        if base:
            detail["vs_baseline_basis"] = "measured this run"
        else:
            base = BASELINE_FALLBACK_TOK_S
            detail["vs_baseline_basis"] = \
                "round-2 measured fallback (docs/TPU_RUNS.md)"
        detail["headline_dtype"] = headline_dtype
        detail["budget_s"] = budget
        detail["elapsed_s"] = round(time.monotonic() - t0, 1)
        print(json.dumps({
            "metric": "gpt2_124m_paged_decode_tok_per_s_per_chip",
            "value": value,
            "unit": "tokens/sec/chip",
            "vs_baseline": round(value / base, 2) if value else 0.0,
            "detail": detail,
        }), flush=True)

    def on_signal(signum, frame):   # pragma: no cover
        _log(f"signal {signum}: emitting partial result")
        if _LIVE_CHILD[0] is not None:
            try:
                _LIVE_CHILD[0].kill()   # don't leave a child on the TPU
            except Exception:
                pass
        emit()
        sys.exit(0)
    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)

    # Relay-health probe (VERDICT r4 next-step #2): one trivial dispatch
    # in a throwaway child. Healthy: ~10-25s total (import + init +
    # dispatch). The degraded regime that zeroed BENCH_r04 showed ~200s
    # first-dispatch latency — in that regime the normal plan starves
    # every stage on init, so collapse to ONE last-resort headline child
    # with the whole remaining budget.
    probe_cap = 30.0 if _smoke() else 90.0
    pt0 = time.monotonic()
    probe_status, probe = _run_child("probe", probe_cap)
    probe_wall = time.monotonic() - pt0
    detail["relay_probe"] = {
        "status": probe_status, "wall_s": round(probe_wall, 1),
        "dispatch_s": (probe or {}).get("dispatch_s")}
    degraded = (probe_status != "ok" or probe_wall > 60.0
                or (probe or {}).get("dispatch_s", 0) > 30.0)
    if _smoke():
        degraded = probe_status != "ok" and probe_wall >= probe_cap

    # (stage, minimum seconds to bother starting, cap seconds).
    # m124's cap is tight on purpose: the headline sweep + baseline +
    # loaded_queue fit ~200s warm, and every second m124 hoards starves
    # m1558 — the stage BENCH_r03 lost (its 205s share couldn't cover a
    # cold 1.5B compile; tools/tpu_evidence.sh's `warm` stage pre-fills
    # the persistent compile cache so the driver's run stays warm).
    plan = [("m124", 60, 240), ("m1558", 60, 220), ("m1558_b32", 45, 180)]
    if _smoke():
        plan = [("m124", 20, 120), ("m1558", 15, 80), ("m1558_b32", 15, 60)]
    if degraded:
        _log(f"relay DEGRADED (probe {probe_status}, wall {probe_wall:.0f}s)"
             " — last-resort plan")
        detail["degraded_relay"] = True
        plan = [("m124_lastresort", 20, 1e9)]   # whole remaining budget
    # caps are tuned for the driver's ~540s run; a bigger budget (the
    # cache-warming runs, LLMC_BENCH_BUDGET_S=2700) scales them up so
    # cold >10min compiles can actually complete and land in the cache
    cap_scale = max(1.0, budget / (240.0 if _smoke() else 540.0))
    for name, min_s, cap_s in plan:
        left = budget - (time.monotonic() - t0) - reserve
        if left < min_s:
            detail["stages"][name] = f"skipped (budget: {left:.0f}s left)"
            continue
        status, parsed = _run_child(name, min(cap_s * cap_scale, left))
        detail["stages"][name] = status
        if parsed:
            if name in ("m124", "m124_lastresort"):
                detail.update(parsed)
            else:
                key = {"m1558": "gpt2_1558m",
                       "m1558_b32": "gpt2_1558m_b32"}[name]
                detail[key] = parsed

    # Second chance: if the normal plan still produced no headline row
    # (stage hit a mid-run relay flap the probe missed), spend whatever
    # budget remains on the last-resort child rather than emitting 0.0.
    sweep = detail.get("sweep") or {}
    if not degraded and not any("tok_s" in v for v in sweep.values()):
        left = budget - (time.monotonic() - t0) - reserve
        if left >= 45:
            _log(f"no headline row from normal plan — last-resort retry "
                 f"({left:.0f}s left)")
            detail["last_resort_retry"] = True
            status, parsed = _run_child("m124_lastresort", left)
            detail["stages"]["m124_lastresort"] = status
            if parsed:
                detail.update(parsed)   # normal-plan sweep was empty
    emit(final=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=sorted(STAGES))
    ap.add_argument("--deadline-in", type=float, default=1e9)
    args = ap.parse_args()
    if args.stage:
        STAGES[args.stage](_Budget(time.monotonic() + args.deadline_in))
    else:
        main()
