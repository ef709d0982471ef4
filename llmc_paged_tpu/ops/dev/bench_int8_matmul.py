"""INT8 dequant-matmul kernel lab (dev/cuda/matmul_forward.cu pattern).

Run: python -m llmc_paged_tpu.ops.dev.bench_int8_matmul
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from llmc_paged_tpu.ops.dev.harness import sweep
from llmc_paged_tpu.ops.int8 import (
    int8_linear_xla,
    int8_matmul,
    quantize_per_row,
)
from llmc_paged_tpu.ops.layers import linear


def make_args(B, OC, IC):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, IC), dtype=np.float32))
    w = jnp.asarray((rng.standard_normal((OC, IC)) * 0.02).astype(np.float32))
    wq, s = quantize_per_row(w)
    return x, wq, s, w


VERSIONS = {
    "v0_xla_dequant (naive)": lambda x, wq, s, w: int8_linear_xla(x, wq, s),
    "v1_pallas_fused": lambda x, wq, s, w: int8_matmul(x, wq, s),
    # timing context only — differs from int8 by the quantization error
    "fp32_matmul (context)": (lambda x, wq, s, w: linear(x, w),
                              {"validate": False}),
}


def weight_bytes(B, OC, IC):
    return OC * IC  # int8


def flops(B, OC, IC):
    return 2 * B * OC * IC


def main():
    configs = [
        (8, 2304, 768),      # 124M qkv
        (8, 3072, 768),      # 124M fc
        (8, 51200, 768),     # 124M lm_head (padded vocab)
        (8, 4800, 1600),     # 1.5B qkv (unaligned OC path)
        (8, 6400, 1600),     # 1.5B fc
        (256, 3072, 768),    # prefill rows
    ]
    sweep(VERSIONS, make_args, configs, ref_name="v0_xla_dequant (naive)",
          flops_fn=flops, bytes_fn=weight_bytes)


if __name__ == "__main__":
    main()
