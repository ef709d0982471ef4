"""Vocab-softmax kernel lab (dev/cuda/softmax_forward.cu pattern — the
reference's kernel5/kernel7 are online/register-tiled softmaxes over the
50257-wide logits row, train_gpt2.cu:208-263, :295-410).

On TPU a full GPT-2 logits row (50304 f32 = ~200KB) fits in VMEM, so the
Pallas version simply computes whole rows in-block; XLA's fused softmax is
the production path. The online-softmax algorithm itself lives where it
matters on TPU: inside the paged-attention flash-decode kernel
(ops/paged_attention.py).

Run: python -m llmc_paged_tpu.ops.dev.bench_softmax
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from llmc_paged_tpu.ops.dev.harness import sweep


def _softmax_kernel(x_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    o_ref[...] = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_softmax_rows(x: jax.Array, interpret: bool = False) -> jax.Array:
    B, V = x.shape
    # Mosaic requires the second-to-last block dim be a multiple of 8 (or
    # the whole dim): use 8-row blocks — 8 rows x ~200KB still fits VMEM
    br = 8 if B % 8 == 0 else B
    return pl.pallas_call(
        _softmax_kernel,
        grid=(B // br,),
        in_specs=[pl.BlockSpec((br, V), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((br, V), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, V), x.dtype),
        interpret=interpret,
    )(x)


def make_args(B, V):
    rng = np.random.default_rng(0)
    return (jnp.asarray(rng.standard_normal((B, V), dtype=np.float32) * 4),)


INTERP = jax.default_backend() not in ("tpu",)

VERSIONS = {
    "v0_xla_fused": jax.jit(lambda x: jax.nn.softmax(x, axis=-1)),
    "v1_pallas_row_in_vmem": lambda x: pallas_softmax_rows(
        x, interpret=INTERP),
}


def bytes_moved(B, V):
    return 2 * B * V * 4


def main():
    configs = [
        (8, 50304),    # decode logits rows (124M, 128-padded V)
        (64, 50304),
        (8, 51200),    # 2048-padded vocab
    ]
    sweep(VERSIONS, make_args, configs, ref_name="v0_xla_fused",
          bytes_fn=bytes_moved)


if __name__ == "__main__":
    main()
