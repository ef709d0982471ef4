"""Paged-attention kernel lab (dev/cuda/attention_forward.cu pattern:
naive reference → optimized versions, validated then swept).

Run: python -m llmc_paged_tpu.ops.dev.bench_paged_attention
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from llmc_paged_tpu.kv.layouts import quantize_rows
from llmc_paged_tpu.ops.dev.harness import sweep
from llmc_paged_tpu.ops.paged_attention import (
    paged_decode_attention,
    paged_decode_attention_quant,
    paged_decode_attention_xla,
)


def make_args(B, NH, HS, P, ps, pps):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, NH, HS), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((P, NH, HS, ps), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((P, NH, HS, ps), dtype=np.float32))
    tables = jnp.asarray(
        rng.permutation(P)[: B * pps].reshape(B, pps).astype(np.int32))
    lengths = jnp.asarray(
        rng.integers(ps, pps * ps + 1, B).astype(np.int32))
    return q, k, v, tables, lengths


def _quant(q, k, v, tables, lengths):
    kq, ks = quantize_rows(k)
    vq, vs = quantize_rows(v)
    return paged_decode_attention_quant(
        q, kq, vq, ks[:, :, None, :], vs[:, :, None, :], tables, lengths)


VERSIONS = {
    "v0_xla_gather (naive)": paged_decode_attention_xla,
    "v1_pallas_flash": lambda *a: paged_decode_attention(*a),
    # differs from the float oracle by int8 quantization error (~5e-3) by
    # design — exactness vs the QUANT oracle is covered in tests/; timing
    # context here (includes the quantize-rows cost)
    "v2_pallas_flash_int8kv": (_quant, {"validate": False}),
}


def kv_bytes(B, NH, HS, P, ps, pps):
    return 2 * B * NH * pps * ps * HS * 4


def main():
    configs = [
        (8, 12, 64, 128, 32, 16),    # GPT-2 124M decode, 512-ctx
        (8, 12, 64, 256, 32, 32),    # 1024-ctx
        (16, 12, 64, 512, 32, 32),   # bigger batch
        (8, 25, 64, 128, 32, 16),    # 1.5B head count
    ]
    sweep(VERSIONS, make_args, configs, ref_name="v0_xla_gather (naive)",
          bytes_fn=kv_bytes)


if __name__ == "__main__":
    main()
