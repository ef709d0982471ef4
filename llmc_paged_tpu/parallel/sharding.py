"""L5: tensor parallelism over heads + data parallelism, jax.sharding-native.

The reference's only distribution is DDP gradient all-reduce over NCCL
(train_gpt2.py:400-428). The TPU-native scaling axis for this engine is
tensor parallelism over attention heads (SURVEY.md §2.5): weights and the
KV page pool shard on the head dimension over a mesh "model" axis, decode
runs under shard_map with two psums per layer (Megatron-style), and the
Pallas paged-attention kernel runs unchanged on each shard's local heads.
Data parallelism ("data" axis) is used for training (gradient psum — the
DDP equivalent) and, for serving, across engine replicas (continuous
batching is host-level scheduling, not an array axis).

Multi-host: the same code runs SPMD across hosts after
jax.distributed.initialize(); the mesh spans all devices and collectives
ride ICI within a slice / DCN across hosts.

TP device layout note: the checkpoint packs qkv as (3C, C) rows (Q then K
then V, train_gpt2.c:245). Head-sharding needs each of Q/K/V split by head,
so prepare_tp_params re-lays qkvw to (L, 3, NH, HS, C) and attprojw to
(L, C, NH, HS) before sharding — device layout is decoupled from the file
format.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llmc_paged_tpu.config import GPT2Config, PageConfig
from llmc_paged_tpu.kv.layouts import (
    PagePool,
    QuantPagePool,
    commit_layer_kv,
    commit_layer_kv_quant,
    quantize_rows,
    write_layer_kv,
    write_layer_kv_quant,
)
from llmc_paged_tpu.models import gpt2
from llmc_paged_tpu.ops import layers as L
from llmc_paged_tpu.ops.paged_attention import (
    paged_decode_attention,
    paged_decode_attention_parts,
    paged_decode_attention_parts_xla,
    paged_decode_attention_quant,
    paged_decode_attention_quant_parts,
    paged_decode_attention_quant_xla,
    paged_decode_attention_xla,
)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host init (the NCCL init_process_group analogue,
    train_gpt2.py:400-408): call once per host before building the mesh.
    With no arguments JAX auto-detects the TPU pod environment (the
    torchrun-env-vars equivalent); explicit args cover manual clusters.
    After this, jax.devices() spans the whole slice/pod and the same
    make_mesh + shard_map code runs SPMD — collectives ride ICI within a
    slice and DCN across hosts. No-op if already initialized."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise


def make_mesh(model: int = 1, data: int = 1,
              devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= model * data, (
        f"need {model * data} devices, have {devices.size}")
    grid = devices[: model * data].reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


# PartitionSpecs for the TP device layout produced by prepare_tp_params.
TP_PARAM_SPECS: Dict[str, P] = {
    "wte": P("model", None),          # vocab-sharded for the logits matmul
    "wpe": P(),
    "ln1w": P(), "ln1b": P(),
    "qkvw": P(None, None, "model", None, None),   # (L, 3, NH, HS, C)
    "qkvb": P(None, None, "model", None),         # (L, 3, NH, HS)
    "attprojw": P(None, None, "model", None),     # (L, C, NH, HS)
    "attprojb": P(),
    "ln2w": P(), "ln2b": P(),
    "fcw": P(None, "model", None),                # (L, 4C, C) — 4C split
    "fcb": P(None, "model"),
    "fcprojw": P(None, None, "model"),            # (L, C, 4C)
    "fcprojb": P(),
    "lnfw": P(), "lnfb": P(),
    # INT8 per-output-row scales (added by prepare_tp_params for
    # param_dtype="int8"): each follows its weight's OUTPUT dims — rows on
    # a sharded output axis shard with it, rows on a psum'd (input-sharded)
    # matmul are replicated (the per-row scale multiplies the full sum, so
    # s*psum(partial) == psum(s*partial)).
    "wte_scale": P("model"),                      # (Vp,)
    "qkvw_scale": P(None, None, "model", None),   # (L, 3, NH, HS)
    "attprojw_scale": P(),                        # (L, C)
    "fcw_scale": P(None, "model"),                # (L, 4C)
    "fcprojw_scale": P(),                         # (L, C)
}


def tp_pool_spec(ndim: int = 4) -> P:
    """PartitionSpec for one pool leaf: pages are page-major transposed
    (P, NH, HS, ps) and int8 scales (P, NH, ps) — heads (the TP axis)
    are axis 1 in both."""
    return (P(None, "model", None, None) if ndim == 4
            else P(None, "model", None))


def shard_pool(pool, mesh: Mesh):
    """device_put a PagePool/QuantPagePool onto the mesh with heads
    sharded (the leaf ranks differ, so a single broadcast sharding
    doesn't fit)."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, tp_pool_spec(x.ndim))), pool)


def _pool_specs(cfg: GPT2Config, kv_quant: bool):
    """Pool pytree of PartitionSpecs matching PagePool or QuantPagePool
    structure, for shard_map in/out specs."""
    pages = tuple(tp_pool_spec(4) for _ in range(cfg.num_layers))
    if kv_quant:
        scales = tuple(tp_pool_spec(3) for _ in range(cfg.num_layers))
        return QuantPagePool(pages, pages, scales, scales)
    return PagePool(pages, pages)


def relayout_tp(params: Dict[str, jax.Array], cfg: GPT2Config
                ) -> Dict[str, jax.Array]:
    """File layout → TP device layout (see module docstring)."""
    Lc, C, NH, HS = (cfg.num_layers, cfg.channels, cfg.num_heads,
                     cfg.head_dim)
    out = dict(params)
    out["qkvw"] = params["qkvw"].reshape(Lc, 3, NH, HS, C)
    out["qkvb"] = params["qkvb"].reshape(Lc, 3, NH, HS)
    out["attprojw"] = params["attprojw"].reshape(Lc, C, NH, HS)
    return out


def quantize_tp(tp: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Per-output-row INT8 quantization of a TP-layout pytree (the TP twin
    of ops.int8.quantize_params). Rows are the OUTPUT dims of each matmul
    in the TP device layout, so shards and scales partition together; the
    quantized VALUES are identical to the single-device quantizer's (the
    relayout reshapes never mix a row's elements), so int8 TP logits match
    int8 single-device logits up to psum summation order."""
    def q(w, row_ndim):
        wq, s = quantize_rows(w.reshape(*w.shape[:row_ndim], -1))
        return wq.reshape(w.shape), s

    out = dict(tp)
    out["qkvw"], out["qkvw_scale"] = q(tp["qkvw"], 4)       # (L,3,NH,HS,C)
    out["attprojw"], out["attprojw_scale"] = q(tp["attprojw"], 2)
    out["fcw"], out["fcw_scale"] = q(tp["fcw"], 2)
    out["fcprojw"], out["fcprojw_scale"] = q(tp["fcprojw"], 2)
    out["wte"], out["wte_scale"] = q(tp["wte"], 1)
    return out


def prepare_tp_params(params: Dict[str, np.ndarray], cfg: GPT2Config,
                      mesh: Mesh,
                      param_dtype: str = "float32",
                      activation_dtype: str = "float32"
                      ) -> Dict[str, jax.Array]:
    """Load + relayout (+ quantize) + shard a checkpoint pytree onto the
    mesh. ``param_dtype``: "float32" (parity), "bfloat16" (serving), or
    "int8" (weight-only quant; layernorms/biases/wpe stay float, the same
    split as ops.int8.quantize_params). For int8, ``activation_dtype``
    sets the dtype of the non-quantized leaves (float32 keeps int8 TP
    tokens bit-equal to single-device f32 activations; bfloat16 shaves
    residual/activation traffic — the EngineConfig.activation_dtype knob)."""
    if param_dtype == "bfloat16":
        dtype = jnp.bfloat16
    elif param_dtype == "int8":
        dtype = {"float32": jnp.float32,
                 "bfloat16": jnp.bfloat16}[activation_dtype]
    else:
        dtype = jnp.float32
    dev = gpt2.to_device(params, cfg, dtype)
    tp = relayout_tp(dev, cfg)
    if param_dtype == "int8":
        if any(v.dtype == jnp.int8 for v in tp.values()):
            raise ValueError("prepare_tp_params needs FLOAT params for "
                             "int8 TP serving (it quantizes in the TP "
                             "layout itself)")
        tp = quantize_tp(tp)
    return {k: jax.device_put(v, NamedSharding(mesh, TP_PARAM_SPECS[k]))
            for k, v in tp.items()}


def _param_specs(quant_params: bool) -> Dict[str, P]:
    """shard_map in_specs for the params pytree (scale entries only exist
    for int8 params)."""
    return {k: v for k, v in TP_PARAM_SPECS.items()
            if quant_params or not k.endswith("_scale")}


def _tp_qkv(lp, h):
    """h (..., C) → qkv (3, ..., NHl, HS) through the head-sharded local
    qkv weight: float einsum, or the fused int8 kernel on a 2D reshape
    (rows are exactly the quantization rows, see quantize_tp)."""
    w = lp["qkvw"]                            # (3, NHl, HS, C)
    t, nhl, hs, C = w.shape
    if w.dtype == jnp.int8:
        from llmc_paged_tpu.ops.int8 import int8_linear
        out = int8_linear(h, w.reshape(t * nhl * hs, C),
                          lp["qkvw_scale"].reshape(t * nhl * hs))
        qkv = jnp.moveaxis(out.reshape(*h.shape[:-1], t, nhl, hs), -3, 0)
    else:
        qkv = jnp.einsum("...c,thdc->t...hd", h, w,
                         precision=jax.lax.Precision.HIGHEST)
    return qkv + lp["qkvb"].reshape((t,) + (1,) * (h.ndim - 1) + (nhl, hs))


def _tp_attproj(lp, att):
    """att (..., NHl, HS) → PARTIAL (..., C) over local heads; the caller
    psums (per-row int8 scales commute with the psum: the rows are the
    un-sharded output axis)."""
    w = lp["attprojw"]                        # (C, NHl, HS)
    C, nhl, hs = w.shape
    if w.dtype == jnp.int8:
        from llmc_paged_tpu.ops.int8 import int8_linear
        return int8_linear(att.reshape(*att.shape[:-2], nhl * hs),
                           w.reshape(C, nhl * hs), lp["attprojw_scale"])
    return jnp.einsum("...hd,chd->...c", att, w,
                      precision=jax.lax.Precision.HIGHEST)


def _tp_block_decode(x, lp, pool_l, page, slot, block_tables,
                     lengths, starts, cfg: GPT2Config,
                     use_kernel: bool, interpret: bool, axis: str):
    """One transformer block, decode position, per TP shard.

    x (B, C) replicated; lp holds this layer's local-shard params (float,
    bf16 or int8+scales); pool_l is one layer's local-head pool slices —
    a (k, v) pair or an int8 (k, v, k_scale, v_scale) quadruple. Two
    psums: attproj and fcproj (Megatron pattern)."""
    h = L.layernorm(x, lp["ln1w"], lp["ln1b"])
    qkv = _tp_qkv(lp, h)                      # (3, B, NHl, HS)
    q, k, v = qkv[0], qkv[1], qkv[2]
    if len(pool_l) == 4:                      # int8 KV pages
        pool_l = write_layer_kv_quant(pool_l, k, v, page, slot)
        attend = (paged_decode_attention_quant if use_kernel
                  else paged_decode_attention_quant_xla)
    else:
        pool_l = write_layer_kv(*pool_l, k, v, page, slot)
        attend = (paged_decode_attention if use_kernel
                  else paged_decode_attention_xla)
    kw = {"interpret": interpret} if use_kernel else {}
    att = attend(q, *pool_l, block_tables, lengths, starts, **kw)
    x = x + jax.lax.psum(_tp_attproj(lp, att), axis) + lp["attprojb"]
    h2 = L.layernorm(x, lp["ln2w"], lp["ln2b"])
    ff = L.gelu_tanh(gpt2._lin(lp, "fcw", h2, "fcb"))   # (B, 4C/m) local
    x = x + jax.lax.psum(gpt2._lin(lp, "fcprojw", ff), axis) \
        + lp["fcprojb"]
    return x, pool_l


def _tp_embed(params, tokens, wpe_pos, axis: str, vocab_shard: int):
    """Embedding lookup from the vocab-sharded wte: each shard contributes
    rows it owns, psum combines. int8 wte rows dequantize on the fly."""
    idx = jax.lax.axis_index(axis)
    off = idx * vocab_shard
    local = tokens - off
    in_range = (local >= 0) & (local < vocab_shard)
    safe = jnp.where(in_range, local, 0)
    wte = params["wte"]
    if wte.dtype == jnp.int8:
        rows = wte[safe].astype(jnp.float32) \
            * params["wte_scale"][safe][..., None]
    else:
        rows = wte[safe]
    emb = jax.lax.psum(jnp.where(in_range[..., None], rows, 0.0), axis)
    return emb + params["wpe"][wpe_pos]


def _tp_logits(params, x, axis: str, cfg: GPT2Config):
    """Final LN + vocab-sharded lm_head; all-gather the vocab shards."""
    x = L.layernorm(x, params["lnfw"], params["lnfb"])
    if params["wte"].dtype == jnp.int8:
        from llmc_paged_tpu.ops.int8 import int8_linear
        logits_local = int8_linear(x, params["wte"], params["wte_scale"])
    else:
        logits_local = L.linear(x, params["wte"])    # (B, Vp/m)
    logits = jax.lax.all_gather(logits_local, axis, axis=-1, tiled=True)
    return logits[..., : cfg.vocab_size]


def make_tp_decode_step(cfg: GPT2Config, mesh: Mesh,
                        use_kernel: bool = True,
                        interpret: Optional[bool] = None,
                        quant_params: bool = False,
                        kv_quant: bool = False):
    """Build the tensor-parallel batched paged decode step.

    Returns step(params_tp, tokens, wpe_pos, page, slot, tables, lengths,
    starts, pool) -> (logits (B, V) replicated, pool). params_tp from
    prepare_tp_params; pool sharded with tp_pool_spec(). quant_params /
    kv_quant select the int8 params / int8 KV-page structures (the specs
    must match the pytrees, so they are build-time flags)."""
    m = mesh.shape["model"]
    assert cfg.num_heads % m == 0, (cfg.num_heads, m)
    assert cfg.padded_vocab_size % m == 0
    vocab_shard = cfg.padded_vocab_size // m
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def step(params, tokens, wpe_pos, page, slot, tables, lengths, starts,
             pool):
        x = _tp_embed(params, tokens, wpe_pos, "model", vocab_shard)
        stack = gpt2._layer_stack(params)
        # unrolled layer loop over per-layer pool buffers (see
        # gpt2_paged._decode_core for the measured rationale)
        for i in range(cfg.num_layers):
            lp = {name: w[i] for name, w in stack.items()}
            x, pool_l = _tp_block_decode(
                x, lp, pool.layer(i), page, slot, tables, lengths,
                starts, cfg, use_kernel, interpret, "model")
            pool = pool.with_layer(i, pool_l)
        return _tp_logits(params, x, "model", cfg), pool

    pool_spec = _pool_specs(cfg, kv_quant)
    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(_param_specs(quant_params),
                  P(), P(), P(), P(), P(), P(), P(), pool_spec),
        out_specs=(P(), pool_spec),
        check_vma=False,
    )
    # donate the pool like the single-device decode_step_paged — without
    # donation every per-layer scatter copies that layer's page buffers
    return jax.jit(sharded, donate_argnums=(8,))


def make_tp_decode_chunk(cfg: GPT2Config, mesh: Mesh, num_steps: int,
                         window: int, use_kernel: bool = True,
                         interpret: Optional[bool] = None,
                         top_k: Optional[int] = None,
                         temperature: float = 1.0,
                         quant_params: bool = False,
                         kv_quant: bool = False):
    """Tensor-parallel K-step decode chunk (the TP twin of
    gpt2_paged.decode_chunk_paged): the whole scan runs under one
    shard_map, tokens feed back on device (logits are replicated after the
    lm_head all-gather, so every shard computes the same pick), and the
    engine chains these exactly like the single-device chunks.

    Returns chunk(params_tp, first (B,), pos0 (B,), pages (K,B),
    slots (K,B), tables (B,pps), pool, rng_key) -> (tokens (K,B), pool).
    rng_key: (2,) uint32; all-zeros means greedy argmax, otherwise
    on-device temperature/top-k sampling — the key is REPLICATED so every
    shard draws the identical token."""
    m = mesh.shape["model"]
    assert cfg.num_heads % m == 0 and cfg.padded_vocab_size % m == 0
    vocab_shard = cfg.padded_vocab_size // m
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def chunk(params, first, pos0, pages, slots, tables, pool, rng_key):
        from llmc_paged_tpu.models.gpt2_paged import _chunk_attention

        active = pos0 >= 0
        safe_pos0 = jnp.where(active, pos0, 0)
        stack = gpt2._layer_stack(params)
        sample = jnp.any(rng_key != 0)
        B = first.shape[0]
        K = num_steps
        nhl = cfg.num_heads // m
        HS = cfg.head_dim
        quant_kv = isinstance(pool, QuantPagePool)
        cdtype = params["wpe"].dtype
        tk0 = tuple(jnp.zeros((K, B, nhl, HS), cdtype)
                    for _ in range(cfg.num_layers))
        tv0 = tuple(jnp.zeros((K, B, nhl, HS), cdtype)
                    for _ in range(cfg.num_layers))
        lengths_pool = jnp.where(active, safe_pos0, 0)

        def pick(logits, j):
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            lg = logits / temperature
            if top_k is not None and 0 < top_k < lg.shape[-1]:
                kth = jax.lax.top_k(lg, top_k)[0][..., -1:]
                lg = jnp.where(lg < kth, -jnp.inf, lg)
            key = jax.random.fold_in(
                jax.random.wrap_key_data(rng_key, impl="threefry2x32"), j)
            drawn = jax.random.categorical(key, lg, axis=-1).astype(jnp.int32)
            return jnp.where(sample, drawn, greedy)

        # same pool-prefix + in-flight-tail structure as the single-device
        # decode_chunk_paged (see _chunk_attention for the rationale);
        # the tails hold the LOCAL heads of this shard
        def step(carry, _):
            toks, tks, tvs, j = carry
            pos = safe_pos0 + j
            wpe_pos = jnp.minimum(pos, window - 1)
            starts = jnp.maximum(0, pos + 1 - window)
            x = _tp_embed(params, toks, wpe_pos, "model", vocab_shard)
            for i in range(cfg.num_layers):
                lp = {name: w[i] for name, w in stack.items()}
                h = L.layernorm(x, lp["ln1w"], lp["ln1b"])
                qkv = _tp_qkv(lp, h)
                q, k, v = qkv[0], qkv[1], qkv[2]     # (B, NHl, HS)
                tk = jax.lax.dynamic_update_slice(
                    tks[i], k[None].astype(cdtype), (j, 0, 0, 0))
                tv = jax.lax.dynamic_update_slice(
                    tvs[i], v[None].astype(cdtype), (j, 0, 0, 0))
                tks = tks[:i] + (tk,) + tks[i + 1:]
                tvs = tvs[:i] + (tv,) + tvs[i + 1:]
                att = _chunk_attention(q, pool.layer(i), tk, tv, tables,
                                       lengths_pool, starts, safe_pos0, j,
                                       use_kernel, interpret, quant_kv)
                x = x + jax.lax.psum(_tp_attproj(lp, att), "model") \
                    + lp["attprojb"]
                h2 = L.layernorm(x, lp["ln2w"], lp["ln2b"])
                ff = L.gelu_tanh(gpt2._lin(lp, "fcw", h2, "fcb"))
                x = x + jax.lax.psum(gpt2._lin(lp, "fcprojw", ff), "model") \
                    + lp["fcprojb"]
            logits = _tp_logits(params, x, "model", cfg)
            nxt = pick(logits, j)
            return (nxt, tks, tvs, j + 1), nxt

        (_, tks, tvs, _), out = jax.lax.scan(
            step, (first, tk0, tv0, jnp.int32(0)), None, length=num_steps)

        # page-granular commit, same layout rationale as the single-device
        # chunk (kv.layouts._commit_buffer) — shapes are NH-local here
        for i in range(cfg.num_layers):
            if quant_kv:
                pool_l = commit_layer_kv_quant(pool.layer(i), tks[i],
                                               tvs[i], pages, slots)
            else:
                pool_l = commit_layer_kv(*pool.layer(i), tks[i], tvs[i],
                                         pages, slots)
            pool = pool.with_layer(i, pool_l)
        return out, pool

    pool_spec = _pool_specs(cfg, kv_quant)
    sharded = shard_map(
        chunk, mesh=mesh,
        in_specs=(_param_specs(quant_params),
                  P(), P(), P(), P(), P(), pool_spec, P()),
        out_specs=(P(), pool_spec),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(6,))


def make_tp_prefill(cfg: GPT2Config, mesh: Mesh,
                    quant_params: bool = False,
                    kv_quant: bool = False):
    """Tensor-parallel prompt prefill writing into the sharded pool.
    prefill(params_tp, tokens (B,T), page (B,T), slot (B,T), pool,
    last_pos (B,)) -> (logits (B, V), pool): the lm_head + all-gather run
    only on each row's last prompt position — serving never samples the
    others, and gathering the full (B, T, Vp/m) shards is T times the
    bytes (the same optimization as prefill_paged's last_pos)."""
    m = mesh.shape["model"]
    nh_local = cfg.num_heads // m
    vocab_shard = cfg.padded_vocab_size // m

    def run(params, tokens, page, slot, pool, last_pos):
        from llmc_paged_tpu.kv.layouts import (prompt_page_ids,
                                               write_prompt_pages,
                                               write_prompt_pages_quant)

        B, T = tokens.shape
        pos = jnp.arange(T, dtype=jnp.int32)
        x = _tp_embed(params, tokens, jnp.broadcast_to(pos, (B, T)),
                      "model", vocab_shard)
        # page-granular prompt writes (see gpt2_paged.prefill_paged)
        ps = pool.page_size
        Tp = -(-T // ps) * ps
        page_ids = prompt_page_ids(page, T, ps, pool.num_pages)

        def pad_t(a):
            return (a if Tp == T else
                    jnp.pad(a, ((0, 0), (0, Tp - T), (0, 0), (0, 0))))

        def body_layer(carry, lp, pool_l):
            h = L.layernorm(carry, lp["ln1w"], lp["ln1b"])
            qkv = _tp_qkv(lp, h)                  # (3, B, T, NHl, HS)
            q, k, v = qkv[0], qkv[1], qkv[2]
            if len(pool_l) == 4:
                pool_l = write_prompt_pages_quant(pool_l, pad_t(k),
                                                  pad_t(v), page_ids)
            else:
                pool_l = write_prompt_pages(*pool_l, pad_t(k), pad_t(v),
                                            page_ids)
            qh, kh, vh = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            att = L.causal_attention(qh, kh, vh)
            att = att.transpose(0, 2, 1, 3)       # (B, T, NHl, HS)
            xo = carry + jax.lax.psum(_tp_attproj(lp, att), "model") \
                + lp["attprojb"]
            h2 = L.layernorm(xo, lp["ln2w"], lp["ln2b"])
            ff = L.gelu_tanh(gpt2._lin(lp, "fcw", h2, "fcb"))
            return xo + jax.lax.psum(gpt2._lin(lp, "fcprojw", ff), "model") \
                + lp["fcprojb"], pool_l

        stack = gpt2._layer_stack(params)
        for i in range(cfg.num_layers):
            lp = {name: w[i] for name, w in stack.items()}
            x, pool_l = body_layer(x, lp, pool.layer(i))
            pool = pool.with_layer(i, pool_l)
        x = x[jnp.arange(B), last_pos]            # (B, C)
        return _tp_logits(params, x, "model", cfg), pool

    pool_spec = _pool_specs(cfg, kv_quant)
    sharded = shard_map(
        run, mesh=mesh,
        in_specs=(_param_specs(quant_params),
                  P(), P(), P(), pool_spec, P()),
        out_specs=(P(), pool_spec),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(4,))


def make_tp_prefill_suffix(cfg: GPT2Config, mesh: Mesh,
                           quant_params: bool = False,
                           kv_quant: bool = False,
                           use_kernel: bool = True,
                           interpret: Optional[bool] = None):
    """Tensor-parallel twin of gpt2_paged.prefill_suffix_paged (prefix
    caching): suffix tokens attend the ADOPTED cached prefix through the
    block table (multi-query parts on each shard's local heads + pool
    shard) plus the suffix itself causally, merged online-softmax. Rows
    with pool_len == 0 degenerate to plain prefill, so the engine can
    route every prefix-cache wave here. Same preconditions as the
    single-device version (full-page sharing, suffix starts on a fresh
    page).

    suffix_run(params_tp, tokens (B,T), page (B,T), slot (B,T), pool,
    tables (B,pps), pool_len (B,), last_pos (B,)) -> (logits (B,V), pool)
    """
    from llmc_paged_tpu.models.gpt2_paged import _spec_tail_attention

    m = mesh.shape["model"]
    vocab_shard = cfg.padded_vocab_size // m
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def run(params, tokens, page, slot, pool, tables, pool_len, last_pos):
        from llmc_paged_tpu.kv.layouts import (prompt_page_ids,
                                               write_prompt_pages,
                                               write_prompt_pages_quant)

        B, T = tokens.shape
        pos = pool_len[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        wpe_pos = jnp.minimum(pos, cfg.max_seq_len - 1)
        x = _tp_embed(params, tokens, wpe_pos, "model", vocab_shard)
        quant_kv = isinstance(pool, QuantPagePool)
        ps = pool.page_size
        Tp = -(-T // ps) * ps
        page_ids = prompt_page_ids(page, T, ps, pool.num_pages)
        # same kernel gate as prefill_suffix_paged: the flat mq kernel's
        # VMEM blocks scale with the suffix length
        use_k = use_kernel and T <= 64
        t_off = jnp.zeros(B, jnp.int32)

        def pad_t(a):
            return (a if Tp == T else
                    jnp.pad(a, ((0, 0), (0, Tp - T), (0, 0), (0, 0))))

        stack = gpt2._layer_stack(params)
        for i in range(cfg.num_layers):
            lp = {name: w[i] for name, w in stack.items()}
            h = L.layernorm(x, lp["ln1w"], lp["ln1b"])
            qkv = _tp_qkv(lp, h)                  # (3, B, T, NHl, HS)
            q, k, v = qkv[0], qkv[1], qkv[2]
            if quant_kv:
                pool_l = write_prompt_pages_quant(pool.layer(i), pad_t(k),
                                                  pad_t(v), page_ids)
            else:
                pool_l = write_prompt_pages(*pool.layer(i), pad_t(k),
                                            pad_t(v), page_ids)
            pool = pool.with_layer(i, pool_l)
            att = _spec_tail_attention(q, pool.layer(i), k.swapaxes(0, 1),
                                       v.swapaxes(0, 1), tables, pool_len,
                                       t_off, use_k, interpret, quant_kv)
            x = x + jax.lax.psum(_tp_attproj(lp, att), "model") \
                + lp["attprojb"]
            h2 = L.layernorm(x, lp["ln2w"], lp["ln2b"])
            ff = L.gelu_tanh(gpt2._lin(lp, "fcw", h2, "fcb"))
            x = x + jax.lax.psum(gpt2._lin(lp, "fcprojw", ff), "model") \
                + lp["fcprojb"]
        x = x[jnp.arange(B), last_pos]            # (B, C)
        return _tp_logits(params, x, "model", cfg), pool

    pool_spec = _pool_specs(cfg, kv_quant)
    sharded = shard_map(
        run, mesh=mesh,
        in_specs=(_param_specs(quant_params),
                  P(), P(), P(), pool_spec, P(), P(), P()),
        out_specs=(P(), pool_spec),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(4,))


def make_tp_decode_chunk_spec(cfg: GPT2Config, mesh: Mesh, num_steps: int,
                              spec_k: int, ngram: int = 3,
                              use_kernel: bool = True,
                              interpret: Optional[bool] = None,
                              quant_params: bool = False,
                              kv_quant: bool = False):
    """Tensor-parallel twin of gpt2_paged.decode_chunk_spec (speculative
    decoding): drafting, multi-query verification and greedy acceptance
    all run inside one shard_map'd scan. Every shard computes identical
    drafts (history is replicated and _ngram_draft is deterministic) and
    identical argmax picks (logits are replicated after the lm_head
    all-gather), so acceptance — and therefore the emitted token stream —
    is bit-identical across shards and equal to plain TP greedy decode.
    The KV tails hold only this shard's local heads; the commit coords
    are computed on device from replicated block tables.

    Returns chunk_spec(params_tp, first (B,), pos0 (B,), hist (B,H),
    pool, tables (B,pps)) -> (out (S,spec_k,B), counts (S,B), hist,
    last_tok (B,), new_positions (B,), pool). Greedy only, like the
    single-device path."""
    from llmc_paged_tpu.kv.layouts import token_coords
    from llmc_paged_tpu.models.gpt2_paged import (_ngram_draft,
                                                  _spec_tail_attention)

    m = mesh.shape["model"]
    assert cfg.num_heads % m == 0 and cfg.padded_vocab_size % m == 0
    vocab_shard = cfg.padded_vocab_size // m
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    S, K = num_steps, spec_k
    assert K >= 2, "spec_k < 2 is plain greedy — use make_tp_decode_chunk"

    def chunk(params, first, pos0, hist, pool, tables):
        B = first.shape[0]
        nhl, HS = cfg.num_heads // m, cfg.head_dim
        TK = S * K
        active = pos0 >= 0
        safe_pos0 = jnp.where(active, pos0, 0)
        quant_kv = isinstance(pool, QuantPagePool)
        stack = gpt2._layer_stack(params)
        cdtype = params["wpe"].dtype
        tk0 = tuple(jnp.zeros((TK, B, nhl, HS), cdtype)
                    for _ in range(cfg.num_layers))
        tv0 = tuple(jnp.zeros((TK, B, nhl, HS), cdtype)
                    for _ in range(cfg.num_layers))
        barange = jnp.arange(B, dtype=jnp.int32)
        karange = jnp.arange(K, dtype=jnp.int32)

        def step(carry, _):
            cur_tok, hist, hl, t_off, tks, tvs = carry
            drafts = _ngram_draft(hist, hl, ngram, K - 1)      # (B, K-1)
            inputs = jnp.concatenate([cur_tok[:, None], drafts], axis=1)
            q_pos = (safe_pos0 + t_off)[:, None] + karange[None, :]
            wpe_pos = jnp.minimum(q_pos, cfg.max_seq_len - 1)
            x = _tp_embed(params, jnp.maximum(inputs, 0), wpe_pos,
                          "model", vocab_shard)                # (B, K, C)
            for i in range(cfg.num_layers):
                lp = {name: w[i] for name, w in stack.items()}
                h = L.layernorm(x, lp["ln1w"], lp["ln1b"])
                qkv = _tp_qkv(lp, h)                # (3, B, K, NHl, HS)
                q, k, v = qkv[0], qkv[1], qkv[2]
                ridx = (t_off[:, None] + karange[None, :]).T   # (K, B)
                tk = tks[i].at[ridx, barange[None, :]].set(
                    k.swapaxes(0, 1).astype(cdtype))
                tv = tvs[i].at[ridx, barange[None, :]].set(
                    v.swapaxes(0, 1).astype(cdtype))
                tks = tks[:i] + (tk,) + tks[i + 1:]
                tvs = tvs[:i] + (tv,) + tvs[i + 1:]
                att = _spec_tail_attention(q, pool.layer(i), tk, tv,
                                           tables, safe_pos0, t_off,
                                           use_kernel, interpret, quant_kv)
                x = x + jax.lax.psum(_tp_attproj(lp, att), "model") \
                    + lp["attprojb"]
                h2 = L.layernorm(x, lp["ln2w"], lp["ln2b"])
                ff = L.gelu_tanh(gpt2._lin(lp, "fcw", h2, "fcb"))
                x = x + jax.lax.psum(gpt2._lin(lp, "fcprojw", ff),
                                     "model") + lp["fcprojb"]
            logits = _tp_logits(params, x, "model", cfg)       # (B, K, V)
            o = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, K)
            lead = jnp.cumprod((o[:, :-1] == drafts).astype(jnp.int32),
                               axis=1)
            a = jnp.where(active, 1 + jnp.sum(lead, axis=1), 0)
            # same history-write contract as the single-device path:
            # inactive rows must not write (see decode_chunk_spec)
            hidx = jnp.where(active[:, None],
                             hl[:, None] + karange[None, :],
                             hist.shape[1])
            hist = hist.at[barange[:, None], hidx].set(o, mode="drop")
            nxt = jnp.take_along_axis(
                o, jnp.maximum(a - 1, 0)[:, None], axis=1)[:, 0]
            nxt = jnp.where(active, nxt, cur_tok)
            return (nxt, hist, hl + a, t_off + a, tks, tvs), (o.T, a)

        hl0 = jnp.where(active, safe_pos0 + 1, 0)
        (last_tok, hist, hl, t_off, tks, tvs), (out, counts) = jax.lax.scan(
            step, (first, hist, hl0, jnp.zeros(B, jnp.int32), tk0, tv0),
            None, length=S)

        tpos = safe_pos0[:, None] + jnp.arange(TK, dtype=jnp.int32)[None, :]
        valid = (jnp.arange(TK, dtype=jnp.int32)[None, :]
                 < t_off[:, None]) & active[:, None]
        pg, sl = token_coords(tables, tpos, pool.page_size, valid,
                              pool.num_pages)
        pg_t, sl_t = pg.T, sl.T
        for i in range(cfg.num_layers):
            if quant_kv:
                pool_l = commit_layer_kv_quant(pool.layer(i), tks[i],
                                               tvs[i], pg_t, sl_t)
            else:
                pool_l = commit_layer_kv(*pool.layer(i), tks[i], tvs[i],
                                         pg_t, sl_t)
            pool = pool.with_layer(i, pool_l)
        new_positions = jnp.where(active, safe_pos0 + t_off, pos0)
        return out, counts, hist, last_tok, new_positions, pool

    pool_spec = _pool_specs(cfg, kv_quant)
    sharded = shard_map(
        chunk, mesh=mesh,
        in_specs=(_param_specs(quant_params),
                  P(), P(), P(), pool_spec, P()),
        out_specs=(P(), P(), P(), P(), P(), pool_spec),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(4,))


def make_dp_train_step(cfg: GPT2Config, mesh: Mesh, optimizer):
    """Data-parallel AdamW training step (the reference's DDP equivalent,
    train_gpt2.py:519-521): batch sharded over "data", params replicated,
    gradient reduction inserted by GSPMD. Returns (step, shard_batch)."""
    batch_sharding = NamedSharding(mesh, P("data", None))
    repl = NamedSharding(mesh, P())

    @functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0, 1))
    def step(params, opt_state, x, y, cfg):
        loss, grads = jax.value_and_grad(gpt2.loss_fn)(params, x, y, cfg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    def shard_batch(x, y):
        return (jax.device_put(x, batch_sharding),
                jax.device_put(y, batch_sharding))

    def replicate(tree):
        return jax.device_put(tree, repl)

    return step, shard_batch, replicate
