"""L2+L3: GPT-2 forward over the paged KV pool.

The reference's paged forward (paged_infer.c gpt2_forward :575-729) calls
add_to_cache + collect_kv_blocks + attention_paged per layer, assuming
batch=1 and one-block writes. Here the same structure is batched and
jittable: the host BlockManager decides (page, slot) coordinates; the
device step consumes them as arrays, scatters new K/V into the per-layer
pool buffers (in-place static-index updates — see kv/layouts.py PagePool
for the measured layout rationale) and runs the Pallas paged-attention
kernel per layer in an unrolled loop.

All host↔device traffic per decode step is: token ids (B,), positions (B,),
page/slot coordinates, block tables (B, pages_per_seq), lengths (B,) — a
few hundred bytes of metadata; KV never leaves the device.

Because page coordinates are decided by the host ALLOCATOR (not by data),
the host can reserve K tokens ahead and run a whole K-step greedy decode
chunk on-device (`decode_chunk_paged`): one host↔device round trip per K
tokens. On this environment's relay-tunneled TPU a sync costs ~60ms, so
chunking is worth ~15× on decode throughput; on directly-attached chips it
still hides dispatch latency.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from llmc_paged_tpu.config import GPT2Config
from llmc_paged_tpu.kv.layouts import (
    PagePool,
    QuantPagePool,
    write_layer_kv,
    write_layer_kv_quant,
)
from llmc_paged_tpu.models import gpt2
from llmc_paged_tpu.ops import layers as L
from llmc_paged_tpu.ops.paged_attention import (
    paged_decode_attention,
    paged_decode_attention_quant,
    paged_decode_attention_quant_xla,
    paged_decode_attention_xla,
)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _decode_core(params, tokens, wpe_pos, page, slot, block_tables, lengths,
                 starts, pool, cfg: GPT2Config, use_kernel: bool
                 ) -> Tuple[jax.Array, "PagePool | QuantPagePool"]:
    """Shared single-token decode body: embed → per-layer (qkv, pool
    scatter, paged attention, mlp), unrolled over layers → logits. Works
    over float pools (PagePool) and INT8 pools (QuantPagePool, dequant
    fused in-kernel).

    The layer loop is UNROLLED Python (not lax.scan) so each per-layer pool
    buffer is updated with a static-index scatter XLA performs in place.
    Streaming stacked pool planes through scan xs/ys copies the whole pool
    every step (~1.6ms at 124M fp32, 1.7-1.9x total slowdown), and carrying
    a stacked pool whole is 6x slower (the carried scatter is not done in
    place) — measured in ops/dev/probe_decode.py. Unroll compile cost at
    124M: ~5-15s per decode-chunk shape."""
    B = tokens.shape[0]
    x = gpt2._embed(params, tokens, wpe_pos)
    quant = isinstance(pool, QuantPagePool)
    interp = {"interpret": True} if (use_kernel and _use_interpret()) else {}
    stack = gpt2._layer_stack(params)

    for i in range(cfg.num_layers):
        lp = {name: w[i] for name, w in stack.items()}
        h = L.layernorm(x, lp["ln1w"], lp["ln1b"])
        qkv = gpt2._lin(lp, "qkvw", h, "qkvb")          # (B, 3C)
        q, k, v = gpt2._split_qkv(qkv, cfg)             # (B, NH, HS)
        if quant:
            pool_l = write_layer_kv_quant(pool.layer(i), k, v, page, slot)
            attend = (paged_decode_attention_quant if use_kernel
                      else paged_decode_attention_quant_xla)
        else:
            pool_l = write_layer_kv(*pool.layer(i), k, v, page, slot)
            attend = (paged_decode_attention if use_kernel
                      else paged_decode_attention_xla)
        pool = pool.with_layer(i, pool_l)
        att = attend(q, *pool_l, block_tables, lengths, starts, **interp)
        att = att.reshape(B, cfg.channels)
        x = x + gpt2._lin(lp, "attprojw", att, "attprojb")
        h2 = L.layernorm(x, lp["ln2w"], lp["ln2b"])
        x = x + gpt2._lin(lp, "fcprojw",
                          L.gelu_tanh(gpt2._lin(lp, "fcw", h2, "fcb")),
                          "fcprojb")

    return gpt2._logits(x, params, cfg), pool


@functools.partial(jax.jit, static_argnames=("cfg", "use_kernel"),
                   donate_argnums=(7,))
def decode_step_paged(params: gpt2.Params, tokens: jax.Array,
                      positions: jax.Array, page: jax.Array,
                      slot: jax.Array, block_tables: jax.Array,
                      lengths: jax.Array, pool: PagePool,
                      cfg: GPT2Config, use_kernel: bool = True,
                      starts: jax.Array | None = None
                      ) -> Tuple[jax.Array, PagePool]:
    """One batched decode step over the paged pool.

    tokens:(B,) new ids; positions:(B,) their wpe positions (the engine
    clamps these in sliding-window parity mode); page/slot:(B,) pool
    coordinates for the new K/V (page == num_pages for inactive rows →
    scatter dropped); block_tables:(B,pages_per_seq); lengths:(B,) valid
    tokens per row INCLUDING the new one (inactive rows 0); starts:(B,)
    optional window lower bound (attention_paged's `offset`,
    paged_infer.c:165). Returns (logits (B, V), updated pool). The pool is
    DONATED — callers must replace their reference with the returned one."""
    if starts is None:
        starts = jnp.zeros_like(lengths)
    return _decode_core(params, tokens, positions, page, slot, block_tables,
                        lengths, starts, pool, cfg, use_kernel)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "use_kernel", "num_steps",
                                    "window", "top_k"),
                   donate_argnums=(6,))
def decode_chunk_paged(params: gpt2.Params, first_tokens: jax.Array,
                       positions0: jax.Array, pages: jax.Array,
                       slots: jax.Array, block_tables: jax.Array,
                       pool: PagePool, cfg: GPT2Config,
                       num_steps: int, window: int,
                       use_kernel: bool = True,
                       rng_key: jax.Array | None = None,
                       top_k: int | None = None,
                       temperature: float | jax.Array = 1.0
                       ) -> Tuple[jax.Array, PagePool]:
    """K-step decode entirely on device (one host round trip).

    first_tokens:(B,) the token to feed at sub-step 0; positions0:(B,) its
    position (rows with positions0 < 0 are inactive for the whole chunk);
    pages/slots:(K, B) pre-reserved pool coordinates for each sub-step
    (host block manager reserves K tokens ahead — allocation is
    deterministic, so coordinates are known before the tokens exist);
    block_tables: the FINAL tables including reserved pages (earlier
    sub-steps simply mask beyond their length). Returns (tokens (K, B) —
    each sub-step's pick, fed back on device — and the pool).

    Token choice: greedy argmax when ``rng_key`` is None; otherwise
    on-device sampling with temperature/top-k (train_gpt2.py:197-222
    transform) via jax.random.categorical, one fold_in per sub-step.
    Device sampling trades the host parity sampler's bit-exact xorshift
    stream for chunked throughput (EngineConfig.device_sampling)."""
    active = positions0 >= 0
    safe_pos0 = jnp.where(active, positions0, 0)

    def pick(logits, j):
        if rng_key is None:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        lg = logits / temperature
        if top_k is not None and 0 < top_k < lg.shape[-1]:
            kth = jax.lax.top_k(lg, top_k)[0][..., -1:]
            lg = jnp.where(lg < kth, -jnp.inf, lg)
        return jax.random.categorical(
            jax.random.fold_in(rng_key, j), lg, axis=-1).astype(jnp.int32)

    def step(carry, xs):
        toks, pool, j = carry
        page_j, slot_j = xs
        pos = safe_pos0 + j
        wpe_pos = jnp.minimum(pos, window - 1)
        lengths = jnp.where(active, pos + 1, 0)
        starts = jnp.maximum(0, pos + 1 - window)
        logits, pool = _decode_core(
            params, toks, wpe_pos, page_j, slot_j, block_tables, lengths,
            starts, pool, cfg, use_kernel)
        nxt = pick(logits, j)
        return (nxt, pool, j + 1), nxt

    (_, pool, _), out = jax.lax.scan(
        step, (first_tokens, pool, jnp.int32(0)), (pages, slots),
        length=num_steps)
    return out, pool


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(4,))
def prefill_paged(params: gpt2.Params, tokens: jax.Array,
                  page: jax.Array, slot: jax.Array, pool: PagePool,
                  cfg: GPT2Config, last_pos: jax.Array | None = None
                  ) -> Tuple[jax.Array, PagePool]:
    """Prompt forward that scatters all T tokens' K/V into the pool.

    tokens: (B, T) right-padded prompts; page/slot: (B, T) pool coordinates
    per token (page == num_pages on padding → dropped). Attention during
    prefill is dense causal over the in-flight K/V (paged_infer.c first-pass
    semantics :699-704: full matmul_forward + copy-all-T-to-cache).
    Returns (logits (B,T,V), updated pool); the pool is DONATED.

    ``last_pos``: optional (B,) int32 — when given, the lm_head projection
    runs only on each row's position ``last_pos[b]`` and logits are (B, V).
    Serving only ever samples the last prompt position, and the (C, Vp)
    projection over all T positions is the dominant prefill cost; the
    reference always computes the full (B,T,V) logits
    (paged_infer.c:727-728), kept here as the last_pos=None parity path."""
    B, T = tokens.shape
    pos = jnp.arange(T, dtype=jnp.int32)
    x = gpt2._embed(params, tokens, pos[None])
    flat_page = page.reshape(B * T)
    flat_slot = slot.reshape(B * T)
    quant = isinstance(pool, QuantPagePool)
    stack = gpt2._layer_stack(params)

    for i in range(cfg.num_layers):
        lp = {name: w[i] for name, w in stack.items()}
        h = L.layernorm(x, lp["ln1w"], lp["ln1b"])
        qkv = gpt2._lin(lp, "qkvw", h, "qkvb")
        q, k, v = gpt2._split_qkv(qkv, cfg)             # (B, T, NH, HS)
        k_rows = k.reshape(B * T, cfg.num_heads, cfg.head_dim)
        v_rows = v.reshape(B * T, cfg.num_heads, cfg.head_dim)
        if quant:
            pool_l = write_layer_kv_quant(pool.layer(i), k_rows, v_rows,
                                          flat_page, flat_slot)
        else:
            pool_l = write_layer_kv(*pool.layer(i), k_rows, v_rows,
                                    flat_page, flat_slot)
        pool = pool.with_layer(i, pool_l)
        qh, kh, vh = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        att = L.prefill_attention(qh, kh, vh)
        att = att.transpose(0, 2, 1, 3).reshape(B, T, cfg.channels)
        x = x + gpt2._lin(lp, "attprojw", att, "attprojb")
        h2 = L.layernorm(x, lp["ln2w"], lp["ln2b"])
        x = x + gpt2._lin(lp, "fcprojw",
                          L.gelu_tanh(gpt2._lin(lp, "fcw", h2, "fcb")),
                          "fcprojb")

    if last_pos is not None:
        x = x[jnp.arange(B), last_pos]          # (B, C)
    return gpt2._logits(x, params, cfg), pool
