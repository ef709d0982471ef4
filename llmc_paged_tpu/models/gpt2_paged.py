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
    commit_layer_kv,
    commit_layer_kv_quant,
    prompt_page_ids,
    token_coords,
    write_layer_kv,
    write_layer_kv_quant,
    write_prompt_pages,
    write_prompt_pages_quant,
)
from llmc_paged_tpu.models import gpt2
from llmc_paged_tpu.ops import layers as L
from llmc_paged_tpu.ops.paged_attention import (
    NEG_INF,
    paged_decode_attention,
    paged_decode_attention_parts,
    paged_decode_attention_parts_xla,
    paged_decode_attention_quant,
    paged_decode_attention_quant_parts,
    paged_decode_attention_quant_parts_xla,
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

        def attend(q, k, v, i=i):
            nonlocal pool
            if quant:
                pool_l = write_layer_kv_quant(pool.layer(i), k, v,
                                              page, slot)
                fn = (paged_decode_attention_quant if use_kernel
                      else paged_decode_attention_quant_xla)
            else:
                pool_l = write_layer_kv(*pool.layer(i), k, v, page, slot)
                fn = (paged_decode_attention if use_kernel
                      else paged_decode_attention_xla)
            pool = pool.with_layer(i, pool_l)
            att = fn(q, *pool_l, block_tables, lengths, starts, **interp)
            return att.reshape(B, cfg.channels)

        x = gpt2._block(x, lp, cfg, attend)

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


def _merge_parts(acc_p, m_p, l_p, acc_t, m_t, l_t, out_dtype):
    """Combine two unnormalized online-softmax parts — the pool prefix
    (acc_p, m_p, l_p) and the in-flight tail (acc_t, m_t, l_t) — into
    normalized attention. The l == 0 guard covers rows where BOTH
    sources are fully masked (inactive rows); their output is garbage
    that the caller's masking discards, but it must be finite. This is
    the one copy of the merge math: the chunk, spec-verify, and
    suffix-prefill paths all depend on it for exactness."""
    m = jnp.maximum(m_p, m_t)
    a_p = jnp.exp(m_p - m)
    a_t = jnp.exp(m_t - m)
    l = l_p * a_p + l_t * a_t
    l = jnp.where(l == 0.0, 1.0, l)
    att = (acc_p * a_p[..., None] + acc_t * a_t[..., None]) / l[..., None]
    return att.astype(out_dtype)


def _chunk_attention(q, pool_l, tail_k, tail_v, block_tables, lengths_pool,
                     starts, pos0, j, use_kernel: bool, interp: bool,
                     quant: bool):
    """Decode-chunk attention = read-only POOL prefix merged with the
    in-flight TAIL, combined exactly via online-softmax parts.

    Why two sources: scattering each sub-step's K/V into the pool and
    reading it back through the kernel made the scan carry the whole pool
    — XLA then copies the pool buffers around the custom call every layer
    (measured ~90us/layer at 1.5B, scaling with POOL SIZE; an aliased
    pass-through kernel was 2.6x worse — the runtime inserted defensive
    copies). With the split, the pool is a scan INVARIANT (tokens
    < pos0, committed by prefill/previous chunks), the chunk's own K/V
    lives in a small (K, B, NH, HS) tail updated with an in-place
    dynamic_update_slice, and the pool is scattered ONCE per chunk.

    q (B, NH, HS); tail_k/tail_v (K, B, NH, HS) with rows [0, j] valid;
    lengths_pool = pos0 (completed tokens); starts = per-row window lower
    bounds for the CURRENT position. Returns (B, NH, HS) in q.dtype."""
    B, NH, HS = q.shape
    K = tail_k.shape[0]
    kw = {"interpret": True} if (use_kernel and interp) else {}
    if use_kernel:
        parts = (paged_decode_attention_quant_parts if quant
                 else paged_decode_attention_parts)
    else:
        parts = (paged_decode_attention_quant_parts_xla if quant
                 else paged_decode_attention_parts_xla)
    acc_p, m_p, l_p = parts(q, *pool_l, block_tables, lengths_pool, starts,
                            **kw)

    qf = q.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.float32(HS))
    scores = jnp.einsum("bhd,kbhd->bhk", qf, tail_k.astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST) * scale
    t_idx = jnp.arange(K, dtype=jnp.int32)
    pos_t = pos0[:, None] + t_idx[None, :]          # (B, K) absolute pos
    mask = (t_idx[None, :] <= j) & (pos_t >= starts[:, None])
    scores = jnp.where(mask[:, None, :], scores, NEG_INF)
    m_t = jnp.max(scores, axis=-1)                  # (B, NH)
    p = jnp.where(mask[:, None, :], jnp.exp(scores - m_t[..., None]), 0.0)
    l_t = jnp.sum(p, axis=-1)
    acc_t = jnp.einsum("bhk,kbhd->bhd", p, tail_v.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)
    return _merge_parts(acc_p, m_p, l_p, acc_t, m_t, l_t, q.dtype)


def decode_chunk_paged(params, first_tokens, positions0, pages, slots,
                       block_tables, pool, cfg, num_steps, window,
                       use_kernel=True, rng_key=None, top_k=None,
                       temperature=1.0, k_arr=None, greedy_rows=None,
                       want_logprobs=False, pen_counts=None,
                       freq_pen=None, pres_pen=None):
    """Public wrapper: argument validation must happen OUTSIDE the jit —
    inside, an explicitly-passed scalar is a tracer and isinstance
    checks silently pass (the guard below would be dead code there)."""
    if rng_key is not None and isinstance(temperature, (int, float)) \
            and temperature == 0:
        # Sampler.__init__ rewrites temperature 0 to greedy before the
        # engine reaches here; a direct caller would get ±inf logits and
        # arbitrary categorical picks with no error
        raise ValueError("temperature=0 with device sampling: use greedy "
                         "(rng_key=None) instead")
    return _decode_chunk_paged(params, first_tokens, positions0, pages,
                               slots, block_tables, pool, cfg,
                               num_steps=num_steps, window=window,
                               use_kernel=use_kernel, rng_key=rng_key,
                               top_k=top_k, temperature=temperature,
                               k_arr=k_arr, greedy_rows=greedy_rows,
                               want_logprobs=want_logprobs,
                               pen_counts=pen_counts, freq_pen=freq_pen,
                               pres_pen=pres_pen)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "use_kernel", "num_steps",
                                    "window", "top_k", "want_logprobs"),
                   donate_argnums=(6,))
def _decode_chunk_paged(params: gpt2.Params, first_tokens: jax.Array,
                       positions0: jax.Array, pages: jax.Array,
                       slots: jax.Array, block_tables: jax.Array,
                       pool: PagePool, cfg: GPT2Config,
                       num_steps: int, window: int,
                       use_kernel: bool = True,
                       rng_key: jax.Array | None = None,
                       top_k: int | None = None,
                       temperature: float | jax.Array = 1.0,
                       k_arr: jax.Array | None = None,
                       greedy_rows: jax.Array | None = None,
                       want_logprobs: bool = False,
                       pen_counts: jax.Array | None = None,
                       freq_pen: jax.Array | None = None,
                       pres_pen: jax.Array | None = None
                       ) -> Tuple[jax.Array, PagePool]:
    """K-step decode entirely on device (one host round trip).

    first_tokens:(B,) the token to feed at sub-step 0; positions0:(B,) its
    position (rows with positions0 < 0 are inactive for the whole chunk);
    pages/slots:(K, B) pre-reserved pool coordinates for each sub-step
    (host block manager reserves K tokens ahead — allocation is
    deterministic, so coordinates are known before the tokens exist);
    block_tables: the FINAL tables including reserved pages. Returns
    (tokens (K, B) — each sub-step's pick, fed back on device — and the
    pool).

    Structure: the pool is READ-ONLY during the chunk (tokens < pos0);
    each sub-step's K/V goes into per-layer in-flight tail buffers and
    attention merges pool + tail (see _chunk_attention). The tails are
    committed to the pool with one scatter per layer after the scan —
    for INT8 pools the tail stays float through the chunk and quantizes
    once at commit.

    Token choice: greedy argmax when ``rng_key`` is None; otherwise
    on-device sampling with temperature/top-k (train_gpt2.py:197-222
    transform) via jax.random.categorical, one fold_in per sub-step.
    Device sampling trades the host parity sampler's bit-exact xorshift
    stream for chunked throughput (EngineConfig.device_sampling).

    Per-request sampling (engine Request.temperature/top_k/greedy):
    ``temperature`` may be a (B,) array; ``k_arr`` (B,) int32 gives each
    row's top-k (0 = no filter) with the STATIC ``top_k`` acting as the
    compile-time cap (rows clamp to it); ``greedy_rows`` (B,) bool takes
    those rows' argmax instead of the categorical draw. Uniform batches
    keep the scalar/static arguments — identical trace, identical
    tokens. With ``want_logprobs`` returns (tokens, (K, B) f32
    raw-softmax logprobs of the chosen tokens, pool) instead.

    Penalties (engine Request.frequency_penalty/presence_penalty,
    OpenAI-style but counting the FULL context like HF's
    repetition_penalty): ``pen_counts`` (B, V) int32 token counts over
    prompt+generated (host-built at chain start), updated device-side
    with each pick; the pick is taken from
    logits - freq_pen*counts - pres_pen*(counts > 0). Logprobs stay
    RAW-softmax. When active, the final counts are returned after the
    tokens (before logprobs/pool) so the next chain link can thread
    them without a host round trip."""
    active = positions0 >= 0
    safe_pos0 = jnp.where(active, positions0, 0)

    def pick(logits, counts, j):
        if pen_counts is not None:
            logits = (logits.astype(jnp.float32)
                      - freq_pen[:, None] * counts
                      - pres_pen[:, None] * (counts > 0))
        if rng_key is None:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        temp = jnp.asarray(temperature)
        # f32 throughout sampling: bf16 serving logits would otherwise
        # stay bf16 through the temperature divide AND give categorical
        # 8-mantissa-bit Gumbel noise (the penalty/per-row paths are
        # already f32 — uniform batches must sample the same way)
        lg = (logits.astype(jnp.float32)
              / (temp[:, None] if temp.ndim == 1 else temp))
        if top_k is not None and 0 < top_k < lg.shape[-1]:
            vals = jax.lax.top_k(lg, top_k)[0]           # (B, top_k)
            if k_arr is None:
                kth = vals[..., -1:]
                lg = jnp.where(lg < kth, -jnp.inf, lg)
            else:
                # per-row k (0 = no filter), clamped to the static cap
                kc = jnp.clip(k_arr, 1, top_k)
                kth = jnp.take_along_axis(vals, kc[:, None] - 1, axis=-1)
                lg = jnp.where((k_arr > 0)[:, None] & (lg < kth),
                               -jnp.inf, lg)
        samp = jax.random.categorical(
            jax.random.fold_in(rng_key, j), lg, axis=-1).astype(jnp.int32)
        if greedy_rows is not None:
            samp = jnp.where(greedy_rows,
                             jnp.argmax(logits, axis=-1).astype(jnp.int32),
                             samp)
        return samp

    B = first_tokens.shape[0]
    K = num_steps
    NH, HS = cfg.num_heads, cfg.head_dim
    quant = isinstance(pool, QuantPagePool)
    interp = _use_interpret()
    stack = gpt2._layer_stack(params)
    cdtype = params["wpe"].dtype           # the serving compute dtype
    tk0 = tuple(jnp.zeros((K, B, NH, HS), cdtype)
                for _ in range(cfg.num_layers))
    tv0 = tuple(jnp.zeros((K, B, NH, HS), cdtype)
                for _ in range(cfg.num_layers))
    # pool reads cover the COMPLETED prefix only — fixed across the chunk
    # (safe_pos0 is already 0 on inactive rows)
    lengths_pool = safe_pos0

    def step(carry, _):
        toks, tks, tvs, counts, j = carry
        pos = safe_pos0 + j
        wpe_pos = jnp.minimum(pos, window - 1)
        starts = jnp.maximum(0, pos + 1 - window)
        x = gpt2._embed(params, toks, wpe_pos)
        for i in range(cfg.num_layers):
            lp = {name: w[i] for name, w in stack.items()}

            def attend(q, k, v, i=i):
                nonlocal tks, tvs
                # in-place dynamic_update_slice at the (scalar) sub-step
                # index
                tk = jax.lax.dynamic_update_slice(
                    tks[i], k[None].astype(cdtype), (j, 0, 0, 0))
                tv = jax.lax.dynamic_update_slice(
                    tvs[i], v[None].astype(cdtype), (j, 0, 0, 0))
                tks = tks[:i] + (tk,) + tks[i + 1:]
                tvs = tvs[:i] + (tv,) + tvs[i + 1:]
                att = _chunk_attention(q, pool.layer(i), tk, tv,
                                       block_tables, lengths_pool, starts,
                                       safe_pos0, j, use_kernel, interp,
                                       quant)
                return att.reshape(B, cfg.channels)

            x = gpt2._block(x, lp, cfg, attend)
        logits = gpt2._logits(x, params, cfg)
        nxt = pick(logits, counts, j)
        if pen_counts is not None:
            counts = counts.at[jnp.arange(B), nxt].add(1)
        if want_logprobs:
            # chosen token's logprob under the RAW softmax (the model's
            # own confidence — independent of the sampling transform)
            lse = jax.scipy.special.logsumexp(
                logits.astype(jnp.float32), axis=-1)
            lp = (jnp.take_along_axis(
                logits.astype(jnp.float32), nxt[:, None], axis=-1)[:, 0]
                - lse)
            return (nxt, tks, tvs, counts, j + 1), (nxt, lp)
        return (nxt, tks, tvs, counts, j + 1), nxt

    counts0 = (jnp.zeros((), jnp.int32) if pen_counts is None
               else pen_counts)
    (_, tks, tvs, counts_fin, _), out = jax.lax.scan(
        step, (first_tokens, tk0, tv0, counts0, jnp.int32(0)), None,
        length=num_steps)
    if want_logprobs:
        out, logps = out

    # commit the chunk's K/V: page-granular gather/blend/scatter per
    # layer (int8 pools quantize here, once, instead of per sub-step).
    # NOT the flat (K*B,) token scatter — that shape makes XLA transpose
    # every pool buffer twice per chunk call (see kv.layouts._commit_buffer)
    for i in range(cfg.num_layers):
        if quant:
            pool_l = commit_layer_kv_quant(pool.layer(i), tks[i], tvs[i],
                                           pages, slots)
        else:
            pool_l = commit_layer_kv(*pool.layer(i), tks[i], tvs[i],
                                     pages, slots)
        pool = pool.with_layer(i, pool_l)
    ret = (out,)
    if pen_counts is not None:
        ret += (counts_fin,)
    if want_logprobs:
        ret += (logps,)
    return ret + (pool,) if len(ret) > 1 else (out, pool)


def _ngram_draft(hist: jax.Array, hl: jax.Array, n: int, d: int
                 ) -> jax.Array:
    """Device-side prompt-lookup drafting: for each row, find the MOST
    RECENT position whose n-gram equals the row's last n tokens and
    propose the d tokens that followed it. Returns (B, d) int32 with -1
    where no draft exists (no match, or the continuation runs past the
    known tokens) — -1 never equals an argmax, so bogus drafts are simply
    rejected by verification; correctness never depends on draft quality.

    hist (B, H): all known tokens per row (prompt + generated); hl (B,):
    how many are valid. Cost is a (B, H, n) compare — noise next to one
    decode step on the MXU."""
    B, H = hist.shape
    idx = hl[:, None] - n + jnp.arange(n, dtype=jnp.int32)[None, :]
    tail = jnp.take_along_axis(hist, jnp.clip(idx, 0, H - 1), axis=1)
    Wn = H - n + 1
    win = jnp.stack([hist[:, i:i + Wn] for i in range(n)], axis=-1)
    j_idx = jnp.arange(Wn, dtype=jnp.int32)[None, :]
    # j == hl-n is the trivial self-match (continuation = the empty
    # future); require the match to end at least one token earlier
    ok = (j_idx + n <= hl[:, None] - 1) & (hl[:, None] >= n + 1)
    match = jnp.all(win == tail[:, None, :], axis=-1) & ok
    best = jnp.max(jnp.where(match, j_idx, -1), axis=1)          # (B,)
    didx = best[:, None] + n + jnp.arange(d, dtype=jnp.int32)[None, :]
    drafts = jnp.take_along_axis(hist, jnp.clip(didx, 0, H - 1), axis=1)
    valid = (best >= 0)[:, None] & (didx < hl[:, None])
    return jnp.where(valid, drafts, -1)


def _spec_tail_attention(q, pool_l, tail_k, tail_v, block_tables, pos0,
                         t_off, use_kernel: bool, interp: bool, quant: bool):
    """Verify-step attention: KQ in-flight queries against the read-only
    pool prefix (multi-query parts kernel — ONE page walk for all KQ) plus
    the chunk tail, merged via online-softmax parts like _chunk_attention.

    q (B, KQ, NH, HS); tail_k/tail_v (TK, B, NH, HS) where rows
    [0, t_off[b]) hold this chunk's ACCEPTED tokens and rows
    [t_off[b], t_off[b]+KQ) the current in-flight block (query j attends
    tail rows r <= t_off[b]+j — causal within the block, total over the
    accepted prefix). Rows past that are stale rejected writes — masked."""
    from llmc_paged_tpu.ops.paged_attention import (
        paged_decode_attention_parts_mq,
        paged_decode_attention_parts_mq_xla,
        paged_decode_attention_quant_parts_mq,
        paged_decode_attention_quant_parts_mq_xla,
    )
    B, KQ, NH, HS = q.shape
    TK = tail_k.shape[0]
    kw = {"interpret": True} if (use_kernel and interp) else {}
    if use_kernel:
        parts = (paged_decode_attention_quant_parts_mq if quant
                 else paged_decode_attention_parts_mq)
    else:
        parts = (paged_decode_attention_quant_parts_mq_xla if quant
                 else paged_decode_attention_parts_mq_xla)
        kw = {}
    starts = jnp.zeros_like(pos0)
    acc_p, m_p, l_p = parts(q, *pool_l, block_tables, pos0, starts, **kw)

    qf = q.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.float32(HS))
    scores = jnp.einsum("bqhd,kbhd->bqhk", qf, tail_k.astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST) * scale
    r_idx = jnp.arange(TK, dtype=jnp.int32)
    limit = t_off[:, None] + jnp.arange(KQ, dtype=jnp.int32)[None, :]
    mask = r_idx[None, None, :] <= limit[..., None]       # (B, KQ, TK)
    scores = jnp.where(mask[:, :, None, :], scores, NEG_INF)
    m_t = jnp.max(scores, axis=-1)                        # (B, KQ, NH)
    p = jnp.where(mask[:, :, None, :],
                  jnp.exp(scores - m_t[..., None]), 0.0)
    l_t = jnp.sum(p, axis=-1)
    acc_t = jnp.einsum("bqhk,kbhd->bqhd", p, tail_v.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)
    return _merge_parts(acc_p, m_p, l_p, acc_t, m_t, l_t, q.dtype)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "use_kernel", "num_steps",
                                    "spec_k", "ngram"),
                   donate_argnums=(4,))
def decode_chunk_spec(params: gpt2.Params, first_tokens: jax.Array,
                      positions0: jax.Array, hist: jax.Array,
                      pool: PagePool, block_tables: jax.Array,
                      cfg: GPT2Config, num_steps: int, spec_k: int,
                      ngram: int = 3, use_kernel: bool = True):
    """SPECULATIVE decode chunk: num_steps greedy verify-steps entirely on
    device, each consuming spec_k tokens — the carried token plus
    spec_k - 1 drafts proposed by device-side prompt lookup (_ngram_draft)
    — in ONE forward. Greedy acceptance keeps the longest prefix where
    draft i equals the argmax at position i-1, so every emitted token
    equals plain greedy decode EXACTLY regardless of draft quality; a step
    yields between 1 and spec_k tokens. Decode is weight-bandwidth-bound,
    so the extra verify FLOPs ride the same weight stream: acceptance
    converts directly into tokens/step. (No reference analogue; the
    TPU-first design is drafting + verification + acceptance all inside
    the jitted scan — zero extra host syncs on a relay-tunneled chip.)

    first_tokens (B,): input token for step 0 (the last known token);
    positions0 (B,): its position = committed pool length (< 0 → row
    inactive for the whole chunk); hist (B, H): ALL known tokens per row
    (prompt + generated), row b valid through positions0[b] + 1 —
    H must fit positions0 + 1 + num_steps*spec_k; block_tables must
    already cover pages for num_steps*spec_k new tokens per row (the host
    reserves the maximum and rolls back with BlockManager.truncate_to).

    Returns (out (S, spec_k, B) int32 — step s's argmax tokens, of which
    counts (S, B) leading entries are real; hist (B, H) updated;
    last_tok (B,), new_positions (B,) — device carries for chaining;
    pool with ONLY accepted K/V committed). Greedy only; sliding-window
    serving keeps the non-speculative chunk path."""
    S, K = num_steps, spec_k
    assert K >= 2, "spec_k < 2 is plain greedy decode — use decode_chunk_paged"
    B = first_tokens.shape[0]
    NH, HS = cfg.num_heads, cfg.head_dim
    TK = S * K
    active = positions0 >= 0
    pos0 = jnp.where(active, positions0, 0)
    quant = isinstance(pool, QuantPagePool)
    interp = _use_interpret()
    stack = gpt2._layer_stack(params)
    cdtype = params["wpe"].dtype
    tk0 = tuple(jnp.zeros((TK, B, NH, HS), cdtype)
                for _ in range(cfg.num_layers))
    tv0 = tuple(jnp.zeros((TK, B, NH, HS), cdtype)
                for _ in range(cfg.num_layers))
    barange = jnp.arange(B, dtype=jnp.int32)
    karange = jnp.arange(K, dtype=jnp.int32)

    def step(carry, _):
        cur_tok, hist, hl, t_off, tks, tvs = carry
        drafts = _ngram_draft(hist, hl, ngram, K - 1)       # (B, K-1)
        inputs = jnp.concatenate([cur_tok[:, None], drafts], axis=1)
        q_pos = (pos0 + t_off)[:, None] + karange[None, :]  # (B, K)
        wpe_pos = jnp.minimum(q_pos, cfg.max_seq_len - 1)
        x = gpt2._embed(params, jnp.maximum(inputs, 0), wpe_pos)

        for i in range(cfg.num_layers):
            lp = {name: w[i] for name, w in stack.items()}

            def attend(q, k, v, i=i):                       # (B, K, NH, HS)
                nonlocal tks, tvs
                ridx = (t_off[:, None] + karange[None, :]).T   # (K, B)
                tk = tks[i].at[ridx, barange[None, :]].set(
                    k.swapaxes(0, 1).astype(cdtype))
                tv = tvs[i].at[ridx, barange[None, :]].set(
                    v.swapaxes(0, 1).astype(cdtype))
                tks = tks[:i] + (tk,) + tks[i + 1:]
                tvs = tvs[:i] + (tv,) + tvs[i + 1:]
                att = _spec_tail_attention(q, pool.layer(i), tk, tv,
                                           block_tables, pos0, t_off,
                                           use_kernel, interp, quant)
                return att.reshape(B, K, cfg.channels)

            x = gpt2._block(x, lp, cfg, attend)
        logits = gpt2._logits(x, params, cfg)               # (B, K, V)
        o = jnp.argmax(logits, axis=-1).astype(jnp.int32)   # (B, K)

        lead = jnp.cumprod((o[:, :-1] == drafts).astype(jnp.int32), axis=1)
        a = jnp.where(active, 1 + jnp.sum(lead, axis=1), 0)  # (B,)
        # append all K outputs at hl (stale entries beyond hl+a are
        # overwritten by the next step before any masked read sees them);
        # INACTIVE rows (hl pinned at 0) must not write at all — their
        # returned history is a device carry a caller may thread, and an
        # unguarded write would clobber its first K entries every step
        hidx = jnp.where(active[:, None],
                         hl[:, None] + karange[None, :],
                         hist.shape[1])          # out of range -> dropped
        hist = hist.at[barange[:, None], hidx].set(o, mode="drop")
        nxt = jnp.take_along_axis(
            o, jnp.maximum(a - 1, 0)[:, None], axis=1)[:, 0]
        nxt = jnp.where(active, nxt, cur_tok)
        return (nxt, hist, hl + a, t_off + a, tks, tvs), (o.T, a)

    hl0 = jnp.where(active, pos0 + 1, 0)
    (last_tok, hist, hl, t_off, tks, tvs), (out, counts) = jax.lax.scan(
        step, (first_tokens, hist, hl0, jnp.zeros(B, jnp.int32), tk0, tv0),
        None, length=S)

    # commit ONLY the accepted tail rows: coordinates computed on device
    # from the block tables (acceptance is data-dependent, so the host
    # cannot precompute them like the non-speculative chunk does)
    tpos = pos0[:, None] + jnp.arange(TK, dtype=jnp.int32)[None, :]
    valid = (jnp.arange(TK, dtype=jnp.int32)[None, :] < t_off[:, None]) \
        & active[:, None]
    pg, sl = token_coords(block_tables, tpos, pool.page_size, valid,
                          pool.num_pages)
    pg_t, sl_t = pg.T, sl.T                       # tail rows are (TK, B)
    for i in range(cfg.num_layers):
        if quant:
            pool_l = commit_layer_kv_quant(pool.layer(i), tks[i], tvs[i],
                                           pg_t, sl_t)
        else:
            pool_l = commit_layer_kv(*pool.layer(i), tks[i], tvs[i],
                                     pg_t, sl_t)
        pool = pool.with_layer(i, pool_l)
    new_positions = jnp.where(active, pos0 + t_off, positions0)
    return out, counts, hist, last_tok, new_positions, pool


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(4,))
def prefill_paged(params: gpt2.Params, tokens: jax.Array,
                  page: jax.Array, slot: jax.Array, pool: PagePool,
                  cfg: GPT2Config, last_pos: jax.Array | None = None
                  ) -> Tuple[jax.Array, PagePool]:
    """Prompt forward that scatters all T tokens' K/V into the pool.

    tokens: (B, T) right-padded prompts; page: (B, T) pool page per token
    (page == num_pages on padding → dropped). PRECONDITION: prompts start
    at position 0 of freshly-allocated pages, so token t's in-page slot
    is t % page_size — the page-granular writes below derive slots from
    position and ``slot`` is accepted only for signature symmetry with
    the decode paths (engine/token_coords always satisfies this; a
    caller passing other slots would NOT get them honored). Attention
    during prefill is dense causal over the in-flight K/V
    (paged_infer.c first-pass semantics :699-704: full matmul_forward +
    copy-all-T-to-cache). Returns (logits (B,T,V), updated pool); the
    pool is DONATED.

    ``last_pos``: optional (B,) int32 — when given, the lm_head projection
    runs only on each row's position ``last_pos[b]`` and logits are (B, V).
    Serving only ever samples the last prompt position, and the (C, Vp)
    projection over all T positions is the dominant prefill cost; the
    reference always computes the full (B,T,V) logits
    (paged_infer.c:727-728), kept here as the last_pos=None parity path."""
    B, T = tokens.shape
    pos = jnp.arange(T, dtype=jnp.int32)
    x = gpt2._embed(params, tokens, pos[None])
    quant = isinstance(pool, QuantPagePool)
    stack = gpt2._layer_stack(params)
    # page-granular writes: ONE leading-dim scatter of whole page blocks
    # per layer instead of B*T per-token lane-column scatters (safe —
    # prompt pages are freshly allocated; see write_prompt_pages)
    ps = pool.page_size
    Tp = -(-T // ps) * ps
    page_ids = prompt_page_ids(page, T, ps, pool.num_pages)

    def pad_t(a):
        return (a if Tp == T else
                jnp.pad(a, ((0, 0), (0, Tp - T), (0, 0), (0, 0))))

    for i in range(cfg.num_layers):
        lp = {name: w[i] for name, w in stack.items()}

        def attend(q, k, v, i=i):                       # (B, T, NH, HS)
            nonlocal pool
            if quant:
                pool_l = write_prompt_pages_quant(pool.layer(i), pad_t(k),
                                                  pad_t(v), page_ids)
            else:
                pool_l = write_prompt_pages(*pool.layer(i), pad_t(k),
                                            pad_t(v), page_ids)
            pool = pool.with_layer(i, pool_l)
            qh, kh, vh = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            att = L.prefill_attention(qh, kh, vh)
            return att.transpose(0, 2, 1, 3).reshape(B, T, cfg.channels)

        x = gpt2._block(x, lp, cfg, attend)

    if last_pos is not None:
        x = x[jnp.arange(B), last_pos]          # (B, C)
    return gpt2._logits(x, params, cfg), pool


@functools.partial(jax.jit, static_argnames=("cfg", "use_kernel"),
                   donate_argnums=(4,))
def prefill_suffix_paged(params: gpt2.Params, tokens: jax.Array,
                         page: jax.Array, slot: jax.Array, pool: PagePool,
                         block_tables: jax.Array, pool_len: jax.Array,
                         cfg: GPT2Config, last_pos: jax.Array,
                         use_kernel: bool = True
                         ) -> Tuple[jax.Array, PagePool]:
    """Prefill of a prompt SUFFIX whose prefix is already resident in the
    pool (prefix caching, PageConfig.prefix_cache): suffix token j of row b
    sits at absolute position pool_len[b] + j and attends the cached
    prefix THROUGH THE BLOCK TABLE (multi-query parts kernel — one page
    walk scores all suffix queries, exactly the speculative-verify read
    path) plus the suffix itself causally, merged online-softmax. The
    reference has no analogue (every prompt re-computes its full KV,
    paged_infer.c:699-704); on TPU the cached prefix is pure metadata —
    adopted block-table entries — so the saved prefill work is exactly
    proportional to the shared length.

    PRECONDITIONS: pool_len[b] % page_size == 0 (only FULL pages are
    shared) and the suffix starts on a freshly-allocated page, so the
    page-granular write path of prefill_paged applies unchanged with
    suffix-local token indices (token j → in-page slot j % ps). Rows with
    pool_len == 0 degenerate to plain prefill (the pool part masks off).
    ``slot`` is accepted for signature symmetry only, like prefill_paged.

    tokens (B, Tsuf) right-padded suffixes; page (B, Tsuf) per-token pool
    coordinates (drop sentinel on padding); pool_len (B,) cached prefix
    lengths; last_pos (B,) suffix-local index of each row's true last
    prompt token. Returns ((B, V) logits at last_pos, pool). Pool DONATED.
    """
    B, T = tokens.shape
    pos = pool_len[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    wpe_pos = jnp.minimum(pos, cfg.max_seq_len - 1)
    x = gpt2._embed(params, tokens, wpe_pos)
    quant = isinstance(pool, QuantPagePool)
    interp = _use_interpret()
    stack = gpt2._layer_stack(params)
    ps = pool.page_size
    Tp = -(-T // ps) * ps
    page_ids = prompt_page_ids(page, T, ps, pool.num_pages)
    # The flat mq kernel's VMEM blocks scale with KQ (= Tsuf here); long
    # suffixes go through the XLA-gather parts instead — prefill is a
    # one-shot compute-bound op, so the gather amortizes (unlike decode).
    use_k = use_kernel and T <= 64
    t_off = jnp.zeros(B, jnp.int32)

    def pad_t(a):
        return (a if Tp == T else
                jnp.pad(a, ((0, 0), (0, Tp - T), (0, 0), (0, 0))))

    for i in range(cfg.num_layers):
        lp = {name: w[i] for name, w in stack.items()}

        def attend(q, k, v, i=i):                       # (B, T, NH, HS)
            nonlocal pool
            if quant:
                pool_l = write_prompt_pages_quant(pool.layer(i), pad_t(k),
                                                  pad_t(v), page_ids)
            else:
                pool_l = write_prompt_pages(*pool.layer(i), pad_t(k),
                                            pad_t(v), page_ids)
            pool = pool.with_layer(i, pool_l)
            att = _spec_tail_attention(q, pool.layer(i), k.swapaxes(0, 1),
                                       v.swapaxes(0, 1), block_tables,
                                       pool_len, t_off, use_k, interp,
                                       quant)
            return att.reshape(B, T, cfg.channels)

        x = gpt2._block(x, lp, cfg, attend)

    x = x[jnp.arange(B), last_pos]                      # (B, C)
    return gpt2._logits(x, params, cfg), pool
