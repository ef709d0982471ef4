"""Elementwise-op fusion lab — covers the remaining reference kernel files
(dev/cuda: positional_forward = encoder, residual_forward, gelu_forward,
crossentropy_forward, crossentropy_softmax_backward) in one sweep.

On TPU these are not standalone kernels: the experiment each config runs is
"ops dispatched separately" vs "ops in one jit" — the measured gap IS the
reason the production forward is a single jitted function and no hand
kernels exist for elementwise work (XLA fuses them into the surrounding
matmul/VPU pipeline).

Run: python -m llmc_paged_tpu.ops.dev.bench_fusion
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from llmc_paged_tpu.ops.dev.harness import sweep
from llmc_paged_tpu.ops.layers import (
    gelu_tanh,
    linear,
    softmax_cross_entropy,
)


def make_args(R, C, V):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((R, C), dtype=np.float32))
    w = jnp.asarray((rng.standard_normal((4 * C, C)) * 0.02)
                    .astype(np.float32))
    res = jnp.asarray(rng.standard_normal((R, 4 * C), dtype=np.float32))
    logits = jnp.asarray(rng.standard_normal((R, V), dtype=np.float32))
    targets = jnp.asarray(rng.integers(0, V, R).astype(np.int32))
    return x, w, res, logits, targets


# matmul → gelu → residual, dispatched as three jits vs fused in one
_mm = jax.jit(lambda x, w: linear(x, w))
_gelu = jax.jit(gelu_tanh)
_add = jax.jit(lambda a, b: a + b)
_fused = jax.jit(lambda x, w, res: gelu_tanh(linear(x, w)) + res)

# crossentropy: softmax-then-log (the reference's two-kernel chain,
# softmax_forward + crossentropy_forward, train_gpt2.c:398-441) vs the
# fused log-softmax NLL the engine uses
_ce_two_pass = jax.jit(lambda lg, t: -jnp.log(
    jnp.take_along_axis(jax.nn.softmax(lg, -1), t[:, None], 1)[:, 0]).mean())
_ce_fused = jax.jit(lambda lg, t: softmax_cross_entropy(lg[None], t[None]))

VERSIONS = {
    "mlp_tail_3_dispatches": (
        lambda x, w, res, lg, t: _add(_gelu(_mm(x, w)), res),
        {"validate": False}),
    "mlp_tail_fused_1_jit": (
        lambda x, w, res, lg, t: _fused(x, w, res),
        {"validate": False}),
    "xent_softmax_then_log": (
        lambda x, w, res, lg, t: _ce_two_pass(lg, t),
        {"validate": False}),
    "xent_fused_logsumexp": (
        lambda x, w, res, lg, t: _ce_fused(lg, t),
        {"validate": False}),
}


def main():
    configs = [
        (8, 768, 50304),      # decode rows
        (1024, 768, 50304),   # prefill rows
        (4096, 768, 50304),
    ]
    # validate the two pairs against each other once
    x, w, res, lg, t = make_args(64, 768, 50304)
    np.testing.assert_allclose(np.asarray(_fused(x, w, res)),
                               np.asarray(_add(_gelu(_mm(x, w)), res)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(_ce_two_pass(lg, t)),
                               float(_ce_fused(lg, t)), rtol=1e-5)
    print("[validate] fused == unfused OK (both pairs)")
    sweep(VERSIONS, make_args, configs, ref_name="mlp_tail_3_dispatches")


if __name__ == "__main__":
    main()
