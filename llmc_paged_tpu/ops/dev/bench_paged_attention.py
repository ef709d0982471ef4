"""Paged-attention kernel lab (dev/cuda/attention_forward.cu pattern:
naive reference → optimized versions, validated then swept).

Run: python -m llmc_paged_tpu.ops.dev.bench_paged_attention
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from llmc_paged_tpu.kv.layouts import quantize_pages
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
    kq, ks = quantize_pages(k)
    vq, vs = quantize_pages(v)
    return paged_decode_attention_quant(
        q, kq, vq, ks, vs, tables, lengths,
        interpret=jax.default_backend() != "tpu")


VERSIONS = {
    "v0_xla_gather (naive)": paged_decode_attention_xla,
    "v1_pallas_flash": lambda *a: paged_decode_attention(
        *a, interpret=jax.default_backend() != "tpu"),
    # differs from the float oracle by int8 quantization error (~5e-3) by
    # design — exactness vs the QUANT oracle is covered in tests/; timing
    # context here (includes the quantize-rows cost)
    "v2_pallas_flash_int8kv": (_quant, {"validate": False}),
}


def kv_bytes(B, NH, HS, P, ps, pps):
    return 2 * B * NH * pps * ps * HS * 4


def main():
    configs = [
        # ps=128 rows exercise the serving manual-DMA kernel; the ps=32
        # row exercises the grid-pipelined fallback for context
        (8, 12, 64, 32, 128, 4),     # GPT-2 124M decode, 512-ctx
        (8, 12, 64, 64, 128, 8),     # 1024-ctx
        (16, 12, 64, 144, 128, 8),   # bigger batch
        (8, 25, 64, 32, 128, 4),     # 1.5B head count
        (8, 12, 64, 128, 32, 16),    # grid-kernel fallback (ps=32)
    ]
    sweep(VERSIONS, make_args, configs, ref_name="v0_xla_gather (naive)",
          bytes_fn=kv_bytes)


if __name__ == "__main__":
    main()
