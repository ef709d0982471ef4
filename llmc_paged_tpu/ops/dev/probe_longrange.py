"""Long-LIVE-RANGE kernel attribution (r5 follow-up to probe_longctx).

probe_longctx measured: the long-context gap is IN-DEVICE (engine
t_materialize ~= wall), the pool-size slope is fixed (0.14 us/page/step
residual), and the live-range slope at 124M int8 is ~0.83 us per live
page per layer-call — ~125 GB/s effective, ~6x off HBM rate. This
script asks WHERE that per-page cost sits, with three 124M cells at
prompt=896 (live ~7.25 pages/seq):

  int8          — the production flat kernel (baseline from the matrix)
  int8-xlaattn  — XLA gather-parts instead of the Pallas kernel: if the
                  gap is Pallas per-page machinery, the one-big-gather
                  path closes on it at long ranges
  int8 NBUF=8   — double ring depth: if the gap is DMA latency not
                  hidden behind per-page compute, deeper prefetch moves

Then warms the bench m1558_b32 stage in the same relay session (the
degraded relay pays ~minutes of toll per process, so everything rides
one process).

Run: python -m llmc_paged_tpu.ops.dev.probe_longrange [--skip-b32]
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
    ap.add_argument("--skip-b32", action="store_true")
    ap.add_argument("--skip-cells", action="store_true")
    args = ap.parse_args()

    from bench import _Budget, _model_cfg, _setup_jax
    _setup_jax()
    import jax

    print(f"device: {jax.devices()[0]}", flush=True)

    if not args.skip_cells:
        from llmc_paged_tpu.ops.dev.probe_decode import chunk_suite
        cfg124 = _model_cfg("124m")
        print("== cell 124m prompt=896 int8-xlaattn (XLA gather parts) ==",
              flush=True)
        chunk_suite(8, cfg124, dtypes=("int8-xlaattn",), page_size=128,
                    prompt=896, pool_mult=1)
        print("== cell 124m prompt=896 int8 NBUF=8 ==", flush=True)
        os.environ["LLMC_ATTN_NBUF"] = "8"
        jax.clear_caches()          # NBUF is read at trace time
        chunk_suite(8, cfg124, dtypes=("int8",), page_size=128,
                    prompt=896, pool_mult=1)
        os.environ.pop("LLMC_ATTN_NBUF")
        jax.clear_caches()

        # VERDICT r4 #5: hardware-verify the O(NBUF)-VMEM scale-DMA int8
        # path at a pool PROVEN to crash the pinned-scales kernel at
        # compile (P=1152 at 124M: 14.2MB scales > the 16MB scoped-vmem
        # stack once ring buffers join). Correctness vs the XLA oracle
        # first, then the perf cell.
        os.environ["LLMC_ATTN_SCALE_DMA"] = "1"
        jax.clear_caches()
        import numpy as np
        import jax.numpy as jnp
        from llmc_paged_tpu.ops.paged_attention import (
            paged_decode_attention_quant_parts,
            paged_decode_attention_quant_parts_xla)
        rng = np.random.default_rng(5)
        B, NH, HS, ps, pps = 8, 12, 64, 128, 8
        P = 1152
        q = jnp.asarray(rng.standard_normal((B, NH, HS)), jnp.float32)
        kq = jnp.asarray(rng.integers(-127, 128, (P, NH, HS, ps)), jnp.int8)
        vq = jnp.asarray(rng.integers(-127, 128, (P, NH, HS, ps)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.005, 0.02, (P, NH, ps)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.005, 0.02, (P, NH, ps)), jnp.float32)
        tables = jnp.asarray(
            rng.permutation(P)[: B * pps].reshape(B, pps).astype(np.int32))
        lengths = jnp.asarray(
            rng.integers(1, pps * ps, B).astype(np.int32))
        starts = jnp.zeros(B, jnp.int32)
        out = paged_decode_attention_quant_parts(
            q, kq, vq, ks, vs, tables, lengths, starts)
        ref = paged_decode_attention_quant_parts_xla(
            q, kq, vq, ks, vs, tables, lengths, starts)
        diffs = [float(jnp.max(jnp.abs(a - b)))
                 for a, b in zip(out, ref)]
        print(f"== scale-DMA kernel-vs-oracle at P={P}: "
              f"acc/m/l maxdiff {diffs} ==", flush=True)
        print("== cell 124m prompt=896 pool_mult=16 int8 SCALE_DMA=1 ==",
              flush=True)
        chunk_suite(8, cfg124, dtypes=("int8",), page_size=128,
                    prompt=896, pool_mult=16)
        os.environ.pop("LLMC_ATTN_SCALE_DMA")
        jax.clear_caches()

    if not args.skip_b32:
        from bench import stage_m1558_b32
        print("== warm m1558_b32 ==", flush=True)
        stage_m1558_b32(_Budget(time.monotonic() + 1800))


if __name__ == "__main__":
    main()
