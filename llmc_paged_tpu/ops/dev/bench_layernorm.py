"""LayerNorm kernel lab (dev/cuda/layernorm_forward.cu pattern).

v0 is the production path: the jnp expression from ops/layers.py under jit
— XLA fuses the two reductions and the affine tail into one VPU pass, which
is why the engine does NOT hand-write this kernel. v1 is a Pallas
row-blocked version kept as a reference point (and as the pedagogical
companion to docs/layernorm.md).

Run: python -m llmc_paged_tpu.ops.dev.bench_layernorm
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from llmc_paged_tpu.ops.dev.harness import sweep
from llmc_paged_tpu.ops.layers import LN_EPS, layernorm


def _ln_kernel(x_ref, w_ref, b_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + LN_EPS)
    o_ref[...] = (y * w_ref[...] + b_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def pallas_layernorm(x: jax.Array, w: jax.Array, b: jax.Array,
                     block_rows: int = 256,
                     interpret: bool = False) -> jax.Array:
    R, C = x.shape
    br = min(block_rows, R)
    assert R % br == 0, "bench configs keep rows divisible by the block"
    return pl.pallas_call(
        _ln_kernel,
        grid=(R // br,),
        in_specs=[
            pl.BlockSpec((br, C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((br, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R, C), x.dtype),
        interpret=interpret,
    )(x, w.reshape(1, C), b.reshape(1, C))


def make_args(R, C):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((R, C), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    return x, w, b


INTERP = jax.default_backend() not in ("tpu",)

VERSIONS = {
    "v0_xla_fused": jax.jit(layernorm),
    "v1_pallas_rowblock": lambda x, w, b: pallas_layernorm(
        x, w, b, interpret=INTERP),
}


def bytes_moved(R, C):
    return 2 * R * C * 4


def main():
    configs = [
        (8, 768),        # decode step rows (124M)
        (1024, 768),     # one prefill row-batch
        (8192, 768),     # large prefill
        (256, 1600),     # 1.5B rows
    ]
    sweep(VERSIONS, make_args, configs, ref_name="v0_xla_fused",
          bytes_fn=bytes_moved)


if __name__ == "__main__":
    main()
