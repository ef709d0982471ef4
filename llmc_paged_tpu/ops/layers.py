"""L1 ops: jnp building blocks with exact fp32 parity to the C reference.

The reference implements these as loop-nest C functions (train_gpt2.c:28-460)
and CUDA kernels (train_gpt2.cu:57-410). On TPU they are single fused XLA
expressions — the MXU takes the matmuls, the VPU the elementwise tail, and
XLA fuses bias/gelu/residual into the matmul epilogues, so there is no need
to hand-write kernels for any of these (Pallas is reserved for the paged
attention and INT8 paths where XLA cannot see the structure).

Parity notes (SURVEY.md §7 "hard parts"):
  * layernorm: eps=1e-5, biased variance (train_gpt2.c:79,90-96)
  * gelu: tanh approximation with sqrt(2/pi) constant (train_gpt2.c:356-363)
  * attention: scale 1/sqrt(head_dim) pre-softmax (train_gpt2.c:232)
  * matmuls run at float32 `highest` precision so the MXU doesn't silently
    split to bf16 passes with different rounding than the C loop order
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

LN_EPS = 1e-5
GELU_SCALE = 0.7978845608028654  # sqrt(2/pi), train_gpt2.c:356


def layernorm(x: jax.Array, w: jax.Array, b: jax.Array,
              eps: float = LN_EPS) -> jax.Array:
    """LayerNorm over the last axis; biased variance like the C loop
    (layernorm_forward, train_gpt2.c:71-111).

    The reduction always runs in fp32 and the result is cast back to x's
    dtype: bf16 serving keeps fp32-quality statistics (the reference's
    bf16 checkpoints deliberately keep layernorm params fp32,
    train_gpt2.py:267-298), and the fp32 parity path is unchanged (the
    casts are no-ops)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    out = (xf - mean) * rstd * w.astype(jnp.float32) \
        + b.astype(jnp.float32)
    return out.astype(x.dtype)


def gelu_tanh(x: jax.Array) -> jax.Array:
    """tanh-approximated GELU (gelu_forward, train_gpt2.c:357-364)."""
    cube = 0.044715 * x * x * x
    return 0.5 * x * (1.0 + jnp.tanh(GELU_SCALE * (x + cube)))


def linear(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
           precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """x(..., IC) @ w(OC, IC)^T + b — the reference weight convention
    (matmul_forward, train_gpt2.c:156-178: out = inp·Wᵀ + bias)."""
    out = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        precision=precision,
        preferred_element_type=x.dtype,
    )
    if b is not None:
        out = out + b
    return out


def causal_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Dense causal attention; q,k,v are (B, NH, T, HS) → (B, NH, T, HS).

    This is the naive O(T²) oracle against which cached/paged paths are
    equivalence-tested (attention_forward, train_gpt2.c:220-294: scale
    1/sqrt(hs), row max subtraction, causal zeroing)."""
    B, NH, T, HS = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(HS, dtype=q.dtype))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=precision) * scale
    qpos = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    neg = jnp.asarray(jnp.finfo(scores.dtype).min, dtype=scores.dtype)
    scores = jnp.where(kpos <= qpos, scores, neg)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, precision=precision)


def causal_attention_flash(q: jax.Array, k: jax.Array,
                           v: jax.Array) -> jax.Array:
    """Flash (tiled, online-softmax) causal attention via JAX's bundled
    TPU Pallas kernel — O(T) memory instead of materialising the (T, T)
    score matrix. q,k,v: (B, NH, T, HS). Used by prefill for long prompts
    (T a multiple of 128); the jnp `causal_attention` above remains the
    parity oracle and the short-prompt/CPU path."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention,
    )

    scale = 1.0 / float(np.sqrt(q.shape[-1]))
    return flash_attention(q, k, v, causal=True, sm_scale=scale)


def prefill_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Dispatch: flash kernel on TPU for long 128-aligned bf16 sequences,
    dense parity attention otherwise. The library flash kernel multiplies
    at bf16 precision (measured ~1e-2 abs vs the fp32 dense oracle on
    N(0,1) inputs), so it only serves the bf16 mode — fp32 prefill keeps
    the HIGHEST-precision dense path for exact parity."""
    T = q.shape[2]
    if (q.dtype == jnp.bfloat16 and jax.default_backend() == "tpu"
            and T >= 256 and T % 128 == 0):
        return causal_attention_flash(q, k, v)
    return causal_attention(q, k, v)


def decode_attention(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                     length, start=None,
                     precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Single-position attention over a dense KV cache.

    q: (B, NH, HS); k_cache/v_cache: (B, NH, S, HS); ``length``: (B,) int32 —
    number of valid cache positions per row (the new token's K/V must
    already be written). Optional ``start``: (B,) int32 window lower bound —
    positions < start are masked out, implementing the reference's sliding
    window (the `offset` of attention_paged, paged_infer.c:165,190 / the
    cache-pointer bump of cached_infer.c:606). Replaces the reference's
    rebuild-qkv-then-dense detour (fill_from_kv_cache,
    cached_infer.c:172-186,663-665) with a masked attention directly over
    the cache."""
    B, NH, S, HS = k_cache.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(HS, dtype=q.dtype))
    scores = jnp.einsum("bhd,bhkd->bhk", q, k_cache, precision=precision) * scale
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, NH, S), 2)
    valid = pos < length[:, None, None]
    if start is not None:
        valid = valid & (pos >= start[:, None, None])
    neg = jnp.asarray(jnp.finfo(scores.dtype).min, dtype=scores.dtype)
    scores = jnp.where(valid, scores, neg)
    probs = jax.nn.softmax(scores, axis=-1)
    # a FULLY-masked row (start >= length) softmaxes to uniform over the
    # masked positions — zero it instead of averaging garbage V rows
    # (matches the parts kernels' l = 0 contract for such rows)
    probs = jnp.where(valid, probs, 0.0)
    return jnp.einsum("bhk,bhkd->bhd", probs, v_cache, precision=precision)


def softmax_cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean NLL over all (B,T) positions (crossentropy_forward,
    train_gpt2.c:427-441, mean at :796-806)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)
