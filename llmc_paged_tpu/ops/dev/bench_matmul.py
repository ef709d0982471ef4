"""Matmul lab (dev/cuda/matmul_forward.cu pattern): the decode GEMVs and
prefill GEMMs of GPT-2 across dtype/precision, all through XLA dot_general
(the MXU is programmed by XLA; there is no hand kernel to beat for dense
matmul — the INT8 fused dequant variant lives in bench_int8_matmul.py).

fp32 HIGHEST is the parity mode (bf16x6 passes, exact-fp32-equivalent
accumulation); fp32 DEFAULT allows bf16x3; bf16 is the serving mode.

Run: python -m llmc_paged_tpu.ops.dev.bench_matmul
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from llmc_paged_tpu.ops.dev.harness import sweep
from llmc_paged_tpu.ops.layers import linear


def make_args(B, OC, IC):
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.standard_normal((B, IC), dtype=np.float32))
    w32 = jnp.asarray((rng.standard_normal((OC, IC)) * 0.02)
                      .astype(np.float32))
    return x32, w32, x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16)


VERSIONS = {
    "fp32_highest (parity)": jax.jit(
        lambda x, w, xh, wh: linear(x, w)),
    # DEFAULT may lower to bf16x3 passes — numerics intentionally differ
    # from the fp32-exact parity mode (measured ~5e-3 at OC=51200), so
    # it's timing context, not a validation target
    "fp32_default": (jax.jit(
        lambda x, w, xh, wh: linear(x, w,
                                    precision=jax.lax.Precision.DEFAULT)),
        {"validate": False}),
    # bf16 differs numerically by design — timing context only
    "bf16 (serving)": (jax.jit(
        lambda x, w, xh, wh: linear(xh, wh,
                                    precision=jax.lax.Precision.DEFAULT)),
        {"validate": False}),
}


def flops(B, OC, IC):
    return 2 * B * OC * IC


def weight_bytes(B, OC, IC):
    return OC * IC * 4


def main():
    configs = [
        (8, 2304, 768),       # 124M decode qkv GEMV
        (8, 768, 768),        # attproj
        (8, 3072, 768),       # fc
        (8, 51200, 768),      # lm_head (padded vocab)
        (1024, 2304, 768),    # prefill GEMM
        (1024, 51200, 768),   # prefill lm_head (full-T parity mode)
        (8, 4800, 1600),      # 1.5B qkv
    ]
    sweep(VERSIONS, make_args, configs, ref_name="fp32_highest (parity)",
          flops_fn=flops, bytes_fn=weight_bytes)


if __name__ == "__main__":
    main()
