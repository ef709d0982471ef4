"""INT8 dequant-matmul kernel lab (dev/cuda/matmul_forward.cu pattern).

Run: python -m llmc_paged_tpu.ops.dev.bench_int8_matmul
"""

from __future__ import annotations

import numpy as np

import jax
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
    return x, wq, s, w, w.astype(jnp.bfloat16), x.astype(jnp.bfloat16)


VERSIONS = {
    "v0_xla_dequant (naive)": lambda x, wq, s, w, wb, xb:
        int8_linear_xla(x, wq, s),
    # serving default: bf16 multiply (int8 exact in bf16, activation
    # rounds) — ~5e-3 off the fp32 ref, so validated via the fp32 variant
    "v1_pallas_fused": (lambda x, wq, s, w, wb, xb: int8_matmul(x, wq, s),
                        {"validate": False}),
    "v1_pallas_fp32exact": lambda x, wq, s, w, wb, xb:
        int8_matmul(x, wq, s, bf16_compute=False),
    # timing context only — these differ numerically from the int8 ref
    "fp32_matmul (context)": (lambda x, wq, s, w, wb, xb: linear(x, w),
                              {"validate": False}),
    # THE bar the fused kernel must beat: the bf16 serving matmul (XLA,
    # 2x the weight bytes of int8)
    "bf16_matmul (serving)": (lambda x, wq, s, w, wb, xb:
                              linear(xb, wb,
                                     precision=jax.lax.Precision.DEFAULT),
                              {"validate": False}),
    # XLA dequant-to-bf16 (does XLA fuse the cast into its gemm?)
    "v2_xla_dequant_bf16": (lambda x, wq, s, w, wb, xb:
                            (jax.lax.dot_general(
                                xb, wq.astype(jnp.bfloat16),
                                dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
                             * s),
                            {"validate": False}),
}


def weight_bytes(B, OC, IC):
    return OC * IC  # int8


def flops(B, OC, IC):
    return 2 * B * OC * IC


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", default="124m",
                    choices=["124m", "1558m", "all"])
    args = ap.parse_args()
    configs_124 = [
        (8, 2304, 768),      # 124M qkv
        (8, 3072, 768),      # 124M fc
        (8, 51200, 768),     # 124M lm_head (padded vocab)
        (256, 3072, 768),    # prefill rows
    ]
    # PADDED 1.5B shapes — what the engine actually runs after
    # pad_weight_for_tpu (plus the unpadded escape-hatch pair for context)
    configs_1558 = [
        (8, 4864, 1664),     # qkv padded
        (8, 1664, 1664),     # attproj padded
        (8, 6400, 1664),     # fc padded
        (8, 1664, 6400),     # fcproj padded
        (8, 51200, 1664),    # lm_head padded
        (8, 4800, 1600),     # qkv unpadded (escape-hatch path)
    ]
    configs = {"124m": configs_124, "1558m": configs_1558,
               "all": configs_124 + configs_1558}[args.set]
    sweep(VERSIONS, make_args, configs, ref_name="v0_xla_dequant (naive)",
          flops_fn=flops, bytes_fn=weight_bytes)


if __name__ == "__main__":
    main()
