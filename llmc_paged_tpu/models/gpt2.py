"""L2: GPT-2 as pure jittable functions over a stacked-params pytree.

The reference's model runtime is a C struct with a monolithic float arena
and an unrolled layer loop (GPT2 + gpt2_forward, train_gpt2.c:555-807).
TPU-first redesign:

  * params are a dict pytree with per-layer tensors stacked on a leading L
    axis, so the layer loop is one `lax.scan` (single compiled block reused
    L times — small compile, good for deep models);
  * forward is a pure function of (params, tokens) under jit;
  * three entry points mirror the reference's three inference modes:
      - `forward`       : full recompute, no cache   (infer.c path)
      - `prefill`       : forward that also fills a dense KV cache
      - `decode_step`   : one-token step over the dense cache
        (cached_infer.c path, without its rebuild-qkv copy)
    The paged path lives in ops/paged_attention.py + kv/ and plugs in via
    the same block structure (models/gpt2_paged.py).
  * the vocab dimension of wte is padded to a lane multiple for the logits
    matmul; logits are sliced back to V so parity is unaffected.

Exact-parity requirements are inherited from ops/layers.py; the reference's
intended semantics (all L layers, per-layer KV) are implemented, not its
truncated `l < 1` loop (SURVEY.md "critical deviations" #1).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llmc_paged_tpu import formats
from llmc_paged_tpu.config import GPT2Config
from llmc_paged_tpu.ops import layers as L

Params = Dict[str, jax.Array]

LAYER_KEYS = ("ln1w", "ln1b", "qkvw", "qkvb", "attprojw", "attprojb",
              "ln2w", "ln2b", "fcw", "fcb", "fcprojw", "fcprojb")
GLOBAL_KEYS = ("wte", "wpe", "lnfw", "lnfb")


class DenseKVCache(NamedTuple):
    """Contiguous per-layer KV cache (cached_infer.c:453-454,554 redesigned:
    [L,B,NH,S,HS] device arrays instead of a raw float arena)."""
    k: jax.Array  # (L, B, NH, S, HS)
    v: jax.Array  # (L, B, NH, S, HS)

    @property
    def max_len(self) -> int:
        return self.k.shape[3]


def init_cache(cfg: GPT2Config, batch: int, max_len: int,
               dtype=jnp.float32) -> DenseKVCache:
    shape = (cfg.num_layers, batch, cfg.num_heads, max_len, cfg.head_dim)
    return DenseKVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def load_params(path: str) -> Tuple[GPT2Config, Dict[str, np.ndarray]]:
    return formats.read_checkpoint(path)


def init_params(cfg: GPT2Config, key: jax.Array,
                dtype=jnp.float32) -> Params:
    """Random init for from-scratch training (train_scratch.c role). GPT-2
    style: normal(0, 0.02) for matmul/embedding weights, ones/zeros for
    layernorm, zero biases."""
    shapes = formats.param_shapes(cfg)
    params: Params = {}
    keys = jax.random.split(key, len(shapes))
    for (name, shape), k in zip(shapes.items(), keys):
        if name in ("ln1w", "ln2w", "lnfw"):
            params[name] = jnp.ones(shape, dtype)
        elif name.endswith("b") or name in ("ln1b", "ln2b", "lnfb"):
            params[name] = jnp.zeros(shape, dtype)
        else:
            params[name] = (0.02 * jax.random.normal(k, shape)).astype(dtype)
    return params


def to_device(params: Dict[str, np.ndarray], cfg: GPT2Config,
              dtype=jnp.float32) -> Params:
    """Move a loaded numpy pytree to the device, padding wte rows to the
    lane-aligned padded vocab (zeros — never sampled because logits are
    sliced back to V). Layernorm params stay fp32 in reduced-precision
    modes (the reference's bf16 checkpoints keep them fp32,
    train_gpt2.py:267-298; ops.layers.layernorm computes in fp32)."""
    ln_keys = ("ln1w", "ln1b", "ln2w", "ln2b", "lnfw", "lnfb")
    out: Params = {}
    for k, v in params.items():
        arr = jnp.asarray(v, dtype=jnp.float32 if k in ln_keys else dtype)
        if k == "wte" and arr.shape[0] == cfg.vocab_size \
                and cfg.padded_vocab_size != cfg.vocab_size:
            # idempotent: already-padded wte (a device pytree fed back
            # through to_device) is left alone
            pad = cfg.padded_vocab_size - cfg.vocab_size
            arr = jnp.pad(arr, ((0, pad), (0, 0)))
        out[k] = arr
    return out


def _layer_stack(params: Params) -> Params:
    keys = [k for k in params
            if k in LAYER_KEYS or (k.endswith("_scale")
                                   and k[:-6] in LAYER_KEYS)]
    return {k: params[k] for k in keys}


def _lin(lp: Params, wkey: str, x: jax.Array,
         bkey: str | None = None) -> jax.Array:
    """Linear through either a float weight or an int8 (weight, scale)
    pair produced by ops.int8.quantize_params."""
    b = lp[bkey] if bkey else None
    w = lp[wkey]
    if w.dtype == jnp.int8:
        from llmc_paged_tpu.ops.int8 import int8_linear
        return int8_linear(x, w, lp[wkey + "_scale"], b)
    return L.linear(x, w, b)


def _embed(params: Params, tokens: jax.Array,
           wpe_pos: jax.Array) -> jax.Array:
    """wte[tokens] + wpe[pos], dequantizing int8 wte rows on the fly.
    Quantized wte may be column-padded to a 128-multiple
    (ops.int8.pad_weight_for_tpu) — slice back to the true channel dim."""
    wte = params["wte"]
    if wte.dtype == jnp.int8:
        rows = wte[tokens].astype(jnp.float32)
        emb = rows * params["wte_scale"][tokens][..., None]
        emb = emb[..., : params["wpe"].shape[-1]]
    else:
        emb = wte[tokens]
    return emb + params["wpe"][wpe_pos]


def _split_qkv(qkv: jax.Array, cfg: GPT2Config) -> Tuple[jax.Array, ...]:
    """(..., 3C) → three (..., NH, HS); K at +C, V at +2C in the packed
    layout (train_gpt2.c:245,285)."""
    C = cfg.channels
    q, k, v = jnp.split(qkv, 3, axis=-1)
    shape = q.shape[:-1] + (cfg.num_heads, cfg.head_dim)
    return q.reshape(shape), k.reshape(shape), v.reshape(shape)


def _block(x: jax.Array, lp: Params, cfg: GPT2Config, attend) -> jax.Array:
    """One transformer block with a caller-supplied attention middle.

    ``attend(q, k, v)`` receives the heads straight from the qkv split
    (shape (..., NH, HS); it owns any KV-cache/pool writes) and returns
    the attended values reshaped back to x's (..., C). Every forward in
    the repo — dense, cached decode, paged decode/prefill, chunked
    decode — is this one skeleton (the reference's per-layer sequence,
    train_gpt2.c:852-897) with a different middle; keeping it in one
    place keeps the residual/layernorm/gelu semantics from diverging."""
    h = L.layernorm(x, lp["ln1w"], lp["ln1b"])
    q, k, v = _split_qkv(_lin(lp, "qkvw", h, "qkvb"), cfg)
    x = x + _lin(lp, "attprojw", attend(q, k, v), "attprojb")
    h2 = L.layernorm(x, lp["ln2w"], lp["ln2b"])
    return x + _lin(lp, "fcprojw",
                    L.gelu_tanh(_lin(lp, "fcw", h2, "fcb")), "fcprojb")


def _block_dense(x: jax.Array, lp: Params, cfg: GPT2Config) -> jax.Array:
    """One transformer block, full-sequence causal attention.
    x: (B, T, C)."""
    B, T, C = x.shape

    def attend(q, k, v):
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))  # (B,NH,T,HS)
        att = L.causal_attention(q, k, v)
        return att.transpose(0, 2, 1, 3).reshape(B, T, C)

    return _block(x, lp, cfg, attend)


def _logits(x: jax.Array, params: Params, cfg: GPT2Config) -> jax.Array:
    """Final layernorm + weight-tied lm_head (train_gpt2.c:790-792),
    computed on the padded vocab then sliced back to V."""
    x = L.layernorm(x, params["lnfw"], params["lnfb"])
    if params["wte"].dtype == jnp.int8:
        from llmc_paged_tpu.ops.int8 import int8_linear
        logits = int8_linear(x, params["wte"], params["wte_scale"])
    else:
        logits = L.linear(x, params["wte"])
    return logits[..., : cfg.vocab_size]


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(params: Params, tokens: jax.Array, cfg: GPT2Config) -> jax.Array:
    """Full no-cache forward: tokens (B, T) int32 → logits (B, T, V) fp32.
    Equivalent of gpt2_forward with the intended all-L loop
    (train_scratch.c:733 semantics)."""
    B, T = tokens.shape
    pos = jnp.arange(T, dtype=jnp.int32)
    x = _embed(params, tokens, pos[None])

    def body(carry, lp):
        return _block_dense(carry, lp, cfg), None

    x, _ = jax.lax.scan(body, x, _layer_stack(params))
    return _logits(x, params, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def loss_fn(params: Params, x: jax.Array, y: jax.Array,
            cfg: GPT2Config) -> jax.Array:
    return L.softmax_cross_entropy(forward(params, x, cfg), y)


grad_fn = jax.jit(jax.value_and_grad(loss_fn), static_argnames=("cfg",))


def _write_cache_prefill(cache_l: jax.Array, kv: jax.Array) -> jax.Array:
    """Write T new rows at the front of one layer's (B,NH,S,HS) cache."""
    T = kv.shape[2]
    return jax.lax.dynamic_update_slice(cache_l, kv, (0, 0, 0, 0))


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2,))
def prefill(params: Params, tokens: jax.Array, cache: DenseKVCache,
            cfg: GPT2Config) -> Tuple[jax.Array, DenseKVCache]:
    """Forward over the prompt that also populates the dense KV cache at
    positions [0, T). Returns (logits (B,T,V), cache). Rows shorter than T
    should be right-padded; positions ≥ the row's true length hold garbage
    K/V that decode_attention masks by length."""
    B, T = tokens.shape
    pos = jnp.arange(T, dtype=jnp.int32)
    x = _embed(params, tokens, pos[None])

    def body(carry, xs):
        lp, k_l, v_l = xs
        written = {}

        def attend(q, k, v):
            q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            written["k"] = _write_cache_prefill(k_l, k)
            written["v"] = _write_cache_prefill(v_l, v)
            att = L.prefill_attention(q, k, v)
            return att.transpose(0, 2, 1, 3).reshape(B, T, cfg.channels)

        xout = _block(carry, lp, cfg, attend)
        return xout, (written["k"], written["v"])

    x, (k_new, v_new) = jax.lax.scan(body, x,
                                     (_layer_stack(params), cache.k, cache.v))
    return _logits(x, params, cfg), DenseKVCache(k_new, v_new)


def _write_cache_at(cache_l: jax.Array, new: jax.Array,
                    pos: jax.Array) -> jax.Array:
    """Write one (B,NH,HS) row into a (B,NH,S,HS) cache at per-row pos."""
    def row(c, n, p):
        return jax.lax.dynamic_update_slice(c, n[:, None, :], (0, p, 0))
    return jax.vmap(row)(cache_l, new, pos)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3,))
def decode_step(params: Params, tokens: jax.Array, pos: jax.Array,
                cache: DenseKVCache, cfg: GPT2Config,
                wpe_pos: jax.Array | None = None,
                starts: jax.Array | None = None
                ) -> Tuple[jax.Array, DenseKVCache]:
    """One decode step over the dense cache.

    tokens: (B,) int32 new token ids; pos: (B,) int32 their positions (== the
    row's current length). Returns (logits (B,V), updated cache). This is
    the cached_infer.c step with the matmul restricted to the new token
    (matmul_cached, cached_infer.c:111-160) and attention reading the cache
    directly instead of rebuilding a packed qkv buffer.

    Sliding-window parity mode (cached_infer.c:606 pointer bump): pass
    ``starts`` = per-row window lower bounds and ``wpe_pos`` = clamped
    position-embedding indices (a post-window token always sits at window
    position W-1 when its K/V is computed). The cache is DONATED — callers
    must replace their reference with the returned one."""
    B = tokens.shape[0]
    if wpe_pos is None:
        wpe_pos = pos
    x = _embed(params, tokens, wpe_pos)  # (B, C)

    def body(carry, xs):
        lp, k_l, v_l = xs
        written = {}

        def attend(q, k, v):
            written["k"] = _write_cache_at(k_l, k, pos)
            written["v"] = _write_cache_at(v_l, v, pos)
            att = L.decode_attention(q, written["k"], written["v"],
                                     pos + 1, start=starts)
            return att.reshape(B, cfg.channels)

        xout = _block(carry, lp, cfg, attend)
        return xout, (written["k"], written["v"])

    x, (k_new, v_new) = jax.lax.scan(body, x,
                                     (_layer_stack(params), cache.k, cache.v))
    return _logits(x, params, cfg), DenseKVCache(k_new, v_new)
