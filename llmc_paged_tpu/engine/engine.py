"""L4: the inference engine — the three decode paths of the reference as
one engine (infer.c / cached_infer.c / paged_infer.c mains), plus
continuous batching on the paged path.

Host↔device contract per decode step: a few int32 metadata arrays go up
(tokens, positions, page/slot coordinates, block tables, lengths, starts);
full-vocab probabilities come down for the parity sampler (the reference
also samples host-side from the device softmax, train_gpt2.cu:1238-1239).
"""

from __future__ import annotations

import collections
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from llmc_paged_tpu.config import EngineConfig, GPT2Config, PageConfig
from llmc_paged_tpu.engine.scheduler import Request, Scheduler, State
from llmc_paged_tpu.kv.layouts import init_pool, token_coords
from llmc_paged_tpu.kv.native import make_block_manager
from llmc_paged_tpu.models import gpt2, gpt2_paged
from llmc_paged_tpu.sampler import Sampler


def _bucket(n: int, step: int = 16) -> int:
    """Pad prefill lengths to buckets so jit recompiles are bounded."""
    return max(step, ((n + step - 1) // step) * step)


def _validate_indices(page_cfg: PageConfig, tables: np.ndarray,
                      pgs: np.ndarray, sls: np.ndarray,
                      lengths: Optional[np.ndarray] = None) -> None:
    """Host-side bounds check of everything the device step will index with
    (EngineConfig.debug_checks). Scatters use page == num_pages as the
    intentional drop sentinel, so pages must be <= num_pages and tables
    strictly < num_pages."""
    assert tables.min() >= 0 and tables.max() < page_cfg.num_pages, \
        f"block table entry out of range [0, {page_cfg.num_pages})"
    assert pgs.min() >= 0 and pgs.max() <= page_cfg.num_pages, \
        "page coordinate out of range (num_pages is the drop sentinel)"
    assert sls.min() >= 0 and sls.max() < page_cfg.page_size, \
        f"slot out of range [0, {page_cfg.page_size})"
    if lengths is not None:
        assert lengths.min() >= 0 and \
            lengths.max() <= page_cfg.max_context, "length exceeds table"


def _check_window(window: Optional[int], cfg: GPT2Config) -> int:
    """Positions beyond max_seq_len would silently CLAMP in the wpe gather
    (garbage embeddings, no error), so reject oversized windows up front;
    window < 1 would silently coerce (0 → full context) or break the
    `toks[-window:]` / starts arithmetic (negative), so reject those too."""
    if window is not None and window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    window = window or cfg.max_seq_len
    if window > cfg.max_seq_len:
        raise ValueError(f"window {window} > max_seq_len {cfg.max_seq_len} "
                         "(position-embedding rows)")
    return window


def _sample_rows(sampler: Sampler, logits, n: int) -> List[int]:
    """Sample the first n rows of a (N, V) device logits array with ONE
    batched device reduction + transfer; the greedy/top-k/parity dispatch
    lives here (and in _pick_token for single rows) only."""
    if sampler.greedy:
        picks = np.asarray(jnp.argmax(logits, axis=-1))
        return [int(picks[i]) for i in range(n)]
    if sampler.transforms_logits and sampler.top_k:
        return _sample_rows_topk(sampler, logits, n)
    if sampler.transforms_logits:
        rows = np.asarray(logits)
        return [sampler.sample_logits(rows[i]) for i in range(n)]
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    return [sampler.sample(probs[i]) for i in range(n)]


def _sample_rows_topk(sampler: Sampler, logits, n: int) -> List[int]:
    """Top-k host sampling from a device-computed top-k prefix: ships
    2·(N, k') instead of (N, V) floats — ~1.6MB → ~3KB per step at GPT-2
    vocab — while the sampled tokens stay BIT-EXACT vs the full-row path
    (sampler.reconstruct_topk_row runs the identical fp32 transform).
    The only case needing the full row is a tie at the shipped boundary
    (an unshipped entry could equal the k-th value, which the reference
    transform keeps), detected per row and downloaded then."""
    from llmc_paged_tpu.sampler import reconstruct_topk_row

    V = logits.shape[-1]
    kship = min(max(2 * sampler.top_k, sampler.top_k + 16), V)
    if kship >= V:
        rows = np.asarray(logits)
        return [sampler.sample_logits(rows[i]) for i in range(n)]
    vals_d, idx_d = jax.lax.top_k(logits, kship)
    vals, idx = np.asarray(vals_d), np.asarray(idx_d)
    out = []
    for i in range(n):
        kth = vals[i, sampler.top_k - 1]
        if vals[i, -1] >= kth:      # boundary tie may extend past the ship
            row = np.asarray(logits[i])
        else:
            row = reconstruct_topk_row(vals[i], idx[i], V)
        out.append(sampler.sample_logits(row))
    return out


def _effective(sampler: Sampler, req: Request) -> Tuple[bool,
                                                        Optional[int],
                                                        float]:
    """Resolve a request's sampling overrides against the engine sampler:
    (greedy, top_k, temperature). temperature 0 means greedy (the Sampler
    idiom); invalid values were rejected by validate_request."""
    g = sampler.greedy if req.greedy is None else req.greedy
    tk = sampler.top_k if req.top_k is None else req.top_k
    tmp = sampler.temperature if req.temperature is None else req.temperature
    if tmp == 0:
        g, tmp = True, 1.0
    return g, tk, tmp


def _has_overrides(req: Request) -> bool:
    return (req.greedy is not None or req.top_k is not None
            or req.temperature is not None)


def _has_penalties(req: Request) -> bool:
    return bool(req.frequency_penalty or req.presence_penalty)


def _penalized_row(row: np.ndarray, req: Request) -> np.ndarray:
    """Host twin of the device chunk's penalty subtraction: counts over
    the FULL context (prompt + generated so far)."""
    V = row.shape[-1]
    cnt = np.zeros(V, np.float32)
    np.add.at(cnt, np.clip(np.asarray(req.tokens), 0, V - 1), 1.0)
    return (row.astype(np.float32) - req.frequency_penalty * cnt
            - req.presence_penalty * (cnt > 0))


def _unpack_chunk(res, pen: bool, want_lp: bool):
    """decode_chunk_paged returns (out[, counts][, logps], pool) by
    flag; normalize to (out, counts|None, logps|None, pool)."""
    i = 1
    counts = lp = None
    if pen:
        counts = res[i]
        i += 1
    if want_lp:
        lp = res[i]
        i += 1
    return res[0], counts, lp, res[-1]


def _sample_rows_per_request(sampler: Sampler, logits,
                             reqs: List[Request]) -> List[int]:
    """Per-row transforms for mixed sampling batches (some request set
    greedy/top_k/temperature overrides): each stochastic row draws from
    the SHARED engine RNG stream in row order (the stream semantics of
    _sample_rows); greedy rows consume nothing. Ships full rows — the
    top-k prefix-ship fast path only applies to uniform batches.

    Draws bypass Sampler.sample (its greedy flag would short-circuit an
    explicit non-greedy override to argmax) and transform-free rows use
    the same device softmax as the uniform _sample_rows path, so a row
    WITHOUT overrides samples bit-identically to a uniform batch."""
    from llmc_paged_tpu.sampler import sample_mult, topk_probs

    eff = [_effective(sampler, r) for r in reqs]
    rows = np.asarray(logits)
    plain = any(not g and tk is None and tmp == 1.0
                and not _has_penalties(r)
                for (g, tk, tmp), r in zip(eff, reqs))
    probs = (np.asarray(jax.nn.softmax(logits, axis=-1)) if plain else None)
    out = []
    for i, (g, tk, tmp) in enumerate(eff):
        req = reqs[i]
        row = (rows[i] if not _has_penalties(req)
               else _penalized_row(rows[i], req))
        if g:
            out.append(int(np.argmax(row)))
        elif tk is None and tmp == 1.0 and not _has_penalties(req):
            out.append(sample_mult(probs[i], sampler.rng.random_f32()))
        else:
            out.append(sample_mult(topk_probs(row, tk, tmp),
                                   sampler.rng.random_f32()))
    return out


def _row_logprob(row: np.ndarray, tok: int) -> float:
    """Chosen token's logprob under the raw softmax of one (V,) logits
    row — the host twin of the device chunk's logsumexp gather."""
    row = np.asarray(row, np.float32)
    m = float(row.max())
    return float(row[tok] - m
                 - np.log(np.exp(row - m, dtype=np.float32)
                          .sum(dtype=np.float32)))


@jax.jit
def _prefill_plp_extract(full, xs, valid, last):
    """From full-T prefill logits (B, T, V): the last-position logits
    (B, V) for the first pick, and each next token's RAW-softmax logprob
    (B, T-1) — tok_lp[b, t] scores xs[b, t+1] given xs[b, :t+1]."""
    lg = full.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(lg[:, :-1], axis=-1)
    tok_lp = jnp.take_along_axis(lg[:, :-1], xs[:, 1:, None],
                                 axis=-1)[..., 0] - lse
    tok_lp = jnp.where(valid[:, 1:], tok_lp, 0.0)
    last_logits = full[jnp.arange(full.shape[0]), last]
    return last_logits, tok_lp


def _pick_token(sampler: Sampler, logits_row) -> int:
    """Sample one token from a (V,) logits row. Greedy takes the argmax on
    device and ships 4 bytes; the parity sampler needs the full softmax on
    the host (the reference also downloads the probs row and samples on the
    CPU, train_gpt2.cu:1238-1239). Top-k/temperature samplers transform the
    raw logits host-side (train_gpt2.py:197-222 semantics)."""
    if sampler.greedy:
        return int(jnp.argmax(logits_row))
    if sampler.transforms_logits and sampler.top_k:
        return _sample_rows_topk(sampler, logits_row[None], 1)[0]
    if sampler.transforms_logits:
        return sampler.sample_logits(np.asarray(logits_row))
    return sampler.sample(np.asarray(jax.nn.softmax(logits_row)))


class InferenceEngine:
    def __init__(self, params: Dict[str, np.ndarray], cfg: GPT2Config,
                 econf: Optional[EngineConfig] = None,
                 use_kernel: bool = True, native_manager: Optional[bool] = None):
        self.cfg = cfg
        self.econf = econf or EngineConfig()
        if isinstance(next(iter(params.values())), jax.Array):
            self.params = params
        else:
            # int8 keeps the non-quantized leaves (biases/LN/wpe) and the
            # activations at activation_dtype: float32 by default (keeps
            # int8 TP tokens bit-equal to single-device); bfloat16 shaves
            # residual/activation traffic (the int8 multiply is bf16
            # either way)
            dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
                     "int8": {"float32": jnp.float32,
                              "bfloat16": jnp.bfloat16}[
                                  self.econf.activation_dtype],
                     }[self.econf.param_dtype]
            self.params = gpt2.to_device(params, cfg, dtype)
        # optional bf16 prefill copy (EngineConfig.prefill_param_dtype):
        # captured from the float params BEFORE quantization — prefill is
        # compute-bound, and the int8 dequant-fused dot throttles the MXU
        # there; decode stays on the int8 weights (bandwidth-bound)
        self._prefill_params = None
        if self.econf.prefill_param_dtype is not None:
            if self.econf.prefill_param_dtype != "bfloat16":
                raise ValueError("prefill_param_dtype: only 'bfloat16' is "
                                 f"supported, got "
                                 f"{self.econf.prefill_param_dtype!r}")
            if self.econf.param_dtype != "int8" or \
                    self.params["wte"].dtype == jnp.int8:
                # float serving dtypes already prefill at param_dtype, and
                # pre-quantized params have no float source to copy from —
                # fail loudly rather than silently measuring the wrong
                # configuration
                raise ValueError(
                    "prefill_param_dtype requires param_dtype='int8' with "
                    "FLOAT input params (it splits prefill/decode dtypes)")
            # layernorm params stay fp32 like every reduced-precision
            # path (gpt2.to_device convention) — a blanket cast would
            # diverge from the TP prefill copy, which goes through
            # prepare_tp_params/to_device
            ln_keys = ("ln1w", "ln1b", "ln2w", "ln2b", "lnfw", "lnfb")
            if not self.econf.mesh_shape:   # TP builds its own sharded copy
                self._prefill_params = {
                    k: (v.astype(jnp.bfloat16)
                        if k not in ln_keys and v.dtype == jnp.float32
                        else v)
                    for k, v in self.params.items()}
        if self.econf.param_dtype == "int8" and \
                self.params["wte"].dtype != jnp.int8:
            from llmc_paged_tpu.ops.int8 import quantize_params
            self.params = quantize_params(self.params)
        # dispatch is async: without a barrier the cast/quantize compute
        # lands on the device timeline ahead of the first prefill and is
        # billed to TTFT (r2 measured int8 TTFT 0.33s vs bf16 0.21s)
        jax.block_until_ready((self.params, self._prefill_params))
        self.use_kernel = use_kernel
        self.native_manager = native_manager
        self.stats: Dict[str, float] = {}
        # Live snapshot for long-lived serving runs: self.stats is only
        # written when run() RETURNS, which a serving loop never does.
        # Rebuilt (whole-dict swap, so concurrent readers never see a
        # partial update) at every scheduler iteration — host-side
        # bookkeeping only, nothing touches the device.
        self.live_stats: Dict[str, float] = {}
        # device page pool kept across run() calls: allocating + zeroing
        # hundreds of MB of per-layer buffers per run costs real wall time
        # on a 1.5B pool, and stale contents are never read (block tables
        # and lengths only ever cover tokens written by the current run)
        self._pool_cache = None
        # prefix caching (PageConfig.prefix_cache) keeps the MANAGER too:
        # its content-addressed cache maps chain hashes to pool pages whose
        # K/V stays resident in _pool_cache between runs, so a later run's
        # repeated prompt prefix is adopted instead of re-prefilled
        self._prefix_mgr = None
        # Tensor-parallel serving (EngineConfig.mesh_shape, e.g.
        # {"model": 4} or {"data": 1, "model": 4}): weights, KV pool and
        # the decode step are sharded over heads via shard_map; the
        # scheduler/block-manager stay host-side and unchanged (block
        # tables are replicated metadata; KV pages never move).
        self._tp = None
        if self.econf.mesh_shape:
            from llmc_paged_tpu.parallel import sharding as sh
            model = int(self.econf.mesh_shape.get("model", 1))
            data = int(self.econf.mesh_shape.get("data", 1))
            mesh = sh.make_mesh(model=model, data=data)
            # TP prepares its own device layout (and, for int8, its own
            # TP-layout quantization) from the caller's FLOAT pytree —
            # self.params may already be quantized for the single-device
            # modes, so go back to the raw argument
            params_np = {k: np.asarray(v) for k, v in params.items()}
            quant = self.econf.param_dtype == "int8"
            kv_quant = self.econf.page.kv_dtype == "int8"
            self._tp = {
                "sh": sh,
                "mesh": mesh,
                "quant_params": quant,
                "kv_quant": kv_quant,
                "params": sh.prepare_tp_params(
                    params_np, cfg, mesh,
                    param_dtype=self.econf.param_dtype,
                    activation_dtype=self.econf.activation_dtype),
                "decode": sh.make_tp_decode_step(
                    cfg, mesh, use_kernel=use_kernel,
                    quant_params=quant, kv_quant=kv_quant),
                "prefill": sh.make_tp_prefill(
                    cfg, mesh, quant_params=quant, kv_quant=kv_quant),
                "chunks": {},   # (num_steps, window, ...) -> compiled fn
            }
            # bf16 prefill copy under TP: a second (sharded) float param
            # pytree + a non-quant prefill step; decode keeps the int8
            # shards (same rationale as the single-device copy above)
            prefill_quant = quant
            if quant and self.econf.prefill_param_dtype == "bfloat16":
                self._tp["prefill_params"] = sh.prepare_tp_params(
                    params_np, cfg, mesh, param_dtype="bfloat16")
                self._tp["prefill"] = sh.make_tp_prefill(
                    cfg, mesh, quant_params=False, kv_quant=kv_quant)
                prefill_quant = False
            # prefix caching under TP: the suffix prefill (adopted prefix
            # read through the block table) has its own sharded program;
            # the content-addressed manager itself is host-side metadata
            # and TP-agnostic
            if self.econf.page.prefix_cache:
                self._tp["prefill_suffix"] = sh.make_tp_prefill_suffix(
                    cfg, mesh, quant_params=prefill_quant,
                    kv_quant=kv_quant, use_kernel=use_kernel)
            jax.block_until_ready(
                (self._tp["params"], self._tp.get("prefill_params")))

    def _default_sampler(self) -> Sampler:
        """The EngineConfig-derived sampler (one construction point)."""
        return Sampler(self.econf.seed, self.econf.greedy,
                       top_k=self.econf.top_k,
                       temperature=self.econf.temperature)

    # -- mode "none": full recompute with sliding window (infer.c) ----------

    def generate_nocache(self, prompt: Sequence[int], max_new_tokens: int,
                         window: Optional[int] = None,
                         sampler: Optional[Sampler] = None) -> List[int]:
        """infer.c semantics: re-run the full forward over the last
        `window` tokens each step (phase-2 slide, infer.c:104-127)."""
        window = _check_window(window, self.cfg)
        sampler = sampler or self._default_sampler()
        stops = self.econf.stop_tokens
        toks = list(prompt)
        for _ in range(max_new_tokens):
            ctx = toks[-window:]
            # pad to a length bucket so each new token doesn't recompile
            # the full forward (zeros after the valid region are masked
            # out by causality; sample from the last VALID position)
            n = len(ctx)
            Tb = min(_bucket(n), self.cfg.max_seq_len)
            padded = np.zeros(Tb, np.int32)
            padded[:n] = ctx
            logits = gpt2.forward(self.params, jnp.asarray(padded[None]),
                                  self.cfg)
            toks.append(_pick_token(sampler, logits[0, n - 1]))
            if stops and toks[-1] in stops:
                break
        return toks

    # -- mode "dense": contiguous KV cache (cached_infer.c) -----------------

    def generate_dense(self, prompt: Sequence[int], max_new_tokens: int,
                       window: Optional[int] = None,
                       sampler: Optional[Sampler] = None) -> List[int]:
        """cached_infer.c semantics: prefill once, then one-token steps.
        When `window` is set and the sequence outgrows it, attention is
        masked to the trailing window and the position embedding clamps to
        window-1 (the cache-pointer bump of cached_infer.c:606: every
        post-window token is computed as the last position of its window)."""
        cfg = self.cfg
        window = _check_window(window, cfg)
        if max_new_tokens <= 0:
            return list(prompt)
        # a prompt longer than the window attends only to its trailing
        # `window` tokens (mode-"none" parity); cache positions are
        # relative to the dropped base
        base = max(0, len(prompt) - window)
        total = len(prompt) - base + max_new_tokens
        sampler = sampler or self._default_sampler()
        stops = self.econf.stop_tokens
        cache = gpt2.init_cache(cfg, 1, total)
        toks = list(prompt)
        logits, cache = gpt2.prefill(
            self.params, jnp.asarray([toks[base:]], jnp.int32), cache, cfg)
        toks.append(_pick_token(sampler, logits[0, -1]))
        for _ in range(max_new_tokens - 1):
            if stops and toks[-1] in stops:
                break
            pos = len(toks) - 1 - base
            wpe_pos = min(pos, window - 1)
            start = max(0, pos + 1 - window)
            logits, cache = gpt2.decode_step(
                self.params, jnp.asarray([toks[-1]], jnp.int32),
                jnp.asarray([pos], jnp.int32), cache, cfg,
                wpe_pos=jnp.asarray([wpe_pos], jnp.int32),
                starts=jnp.asarray([start], jnp.int32))
            toks.append(_pick_token(sampler, logits[0]))
        return toks

    # -- mode "paged": block-table KV + continuous batching ------------------

    def _paged_state(self):
        page = self.econf.page
        if page.prefix_cache:
            # the prefix-caching manager (native C++ twin when buildable,
            # Python model otherwise — equivalence-tested) PERSISTS across
            # runs: cached pages outlive their owners
            mgr = self._prefix_mgr
            # the manager's cached-page metadata is only valid over the
            # SAME device pool buffers; if the pool cache was lost (first
            # run, or an aborted run dropped it) start the cache over
            if mgr is None or self._pool_cache is None:
                mgr = make_block_manager(
                    page.num_pages, page.page_size,
                    max(page.max_seqs, self.econf.max_batch),
                    native=self.native_manager, prefix=True)
                self._prefix_mgr = mgr
            else:
                # drop any live sequences a previous run left behind;
                # their FULL hashed pages demote to the cache, which is
                # exactly the across-run reuse contract
                for pid in range(mgr.max_seqs):
                    mgr.free_prompt(pid)
        else:
            mgr = make_block_manager(page.num_pages, page.page_size,
                                     max(page.max_seqs,
                                         self.econf.max_batch),
                                     native=self.native_manager)
        pool = self._pool_cache
        self._pool_cache = None     # ownership moves to run() (donation)
        if pool is None:
            pool = init_pool(self.cfg, page, dtype=page.kv_dtype)
            if self._tp is not None:
                pool = self._tp["sh"].shard_pool(pool, self._tp["mesh"])
        return mgr, pool

    def generate_paged(self, prompt: Sequence[int], max_new_tokens: int,
                       window: Optional[int] = None,
                       sampler: Optional[Sampler] = None) -> List[int]:
        """Single-sequence paged decode (paged_infer.c main semantics,
        including its sliding-window `offset` when `window` is set)."""
        reqs = [Request(rid=0, prompt=list(prompt),
                        max_new_tokens=max_new_tokens)]
        out = self.run(reqs, window=window, sampler=sampler)
        return out[0].tokens

    def validate_request(self, req: Request,
                         window: Optional[int] = None) -> None:
        """Raise ValueError if `req` could never be scheduled under this
        engine's configuration (too long for the pool, or incompatible
        with an active spec_k / prefix_cache mode). run() applies this to
        every request; serving fronts call it at submission time so a bad
        request fails ITS future instead of the whole serving loop."""
        econf = self.econf
        page = econf.page
        window = _check_window(window, self.cfg)
        if not req.prompt:
            # an empty prompt has no last token to decode from; worse, at
            # admission append_tokens(slot, 0) returns no segments, which
            # run() reads as pool exhaustion — the request would head the
            # queue forever and eventually stall the loop
            raise ValueError(f"request {req.rid} has an empty prompt")
        if req.temperature is not None and not (
                0 <= req.temperature < float("inf")):
            # `not (x >= 0)` form also rejects NaN (json.loads accepts the
            # NaN literal), which would otherwise sample garbage silently
            raise ValueError(f"request {req.rid}: temperature must be "
                             f"finite and >= 0, got {req.temperature}")
        if req.top_k is not None and req.top_k < 1:
            raise ValueError(f"request {req.rid}: top_k must be >= 1, "
                             f"got {req.top_k}")
        if req.logprobs:
            if not econf.serve_logprobs:
                raise ValueError(
                    f"request {req.rid}: logprobs are disabled on this "
                    "engine (EngineConfig.serve_logprobs / CLI "
                    "--no-logprobs)")
            if self._tp is not None:
                raise ValueError(
                    f"request {req.rid}: logprobs under tensor "
                    "parallelism are not supported yet")
            if econf.spec_k >= 2:
                raise ValueError(
                    f"request {req.rid}: logprobs under speculative "
                    "decoding are not supported (acceptance-variable "
                    "verify steps)")
            if econf.cache_mode != "paged":
                raise ValueError(
                    f"request {req.rid}: logprobs require paged serving")
        if req.prompt_logprobs:
            if not econf.serve_logprobs:
                raise ValueError(
                    f"request {req.rid}: logprobs are disabled on this "
                    "engine (EngineConfig.serve_logprobs / CLI "
                    "--no-logprobs)")
            if self._tp is not None:
                raise ValueError(
                    f"request {req.rid}: prompt_logprobs under tensor "
                    "parallelism are not supported yet")
            if econf.cache_mode != "paged":
                raise ValueError(f"request {req.rid}: prompt_logprobs "
                                 "require paged serving")
            if page.prefix_cache:
                raise ValueError(
                    f"request {req.rid}: prompt_logprobs with prefix "
                    "caching are not supported (adopted prefix pages "
                    "skip their prefill, so those positions' logits "
                    "never exist)")
            if len(req.prompt) > window:
                raise ValueError(
                    f"request {req.rid}: prompt_logprobs need the whole "
                    f"prompt attended — prompt {len(req.prompt)} > "
                    f"window {window}")
        if _has_penalties(req):
            for name in ("frequency_penalty", "presence_penalty"):
                v = getattr(req, name)
                if not (float("-inf") < v < float("inf")):
                    raise ValueError(f"request {req.rid}: {name} must be "
                                     f"finite, got {v}")
            if self._tp is not None:
                raise ValueError(
                    f"request {req.rid}: penalties under tensor "
                    "parallelism are not supported yet")
            if econf.spec_k >= 2:
                raise ValueError(
                    f"request {req.rid}: penalties under speculative "
                    "decoding are not supported (the penalized pick is "
                    "not the verified raw argmax)")
        if _has_overrides(req):
            if self._tp is not None:
                raise ValueError(
                    f"request {req.rid}: per-request sampling overrides "
                    "under tensor parallelism are not supported yet")
            if econf.spec_k >= 2 and not _effective(
                    self._default_sampler(), req)[0]:
                raise ValueError(
                    f"request {req.rid}: spec_k requires greedy decoding; "
                    "a non-greedy per-request override cannot be "
                    "speculatively verified")
        if req.max_new_tokens <= 0:
            return
        # prompts longer than the window are truncated to their trailing
        # `window` tokens at admission (mode-"none" parity), so capacity
        # is window-relative
        need = min(len(req.prompt), window) + req.max_new_tokens
        if need > page.max_context:
            raise ValueError(
                f"request {req.rid} needs {need} cached tokens"
                f" > max_context {page.max_context}")
        # physical pages: slid-out pages are reclaimed as the window
        # advances (release_below), so a window-W sequence holds at
        # most ceil(W/ps)+1 live pages however long it runs
        phys = min(need, window + page.page_size)
        if -(-phys // page.page_size) > page.num_pages:
            raise ValueError(
                f"request {req.rid} needs {-(-phys // page.page_size)}"
                f" pages > pool size {page.num_pages} — it can never"
                " be scheduled")
        # spec_k / prefix_cache require that the window NEVER activates
        # (see the mode blocks in run() for the rationale)
        if (econf.spec_k >= 2 or page.prefix_cache) and need > window:
            mode = "spec_k" if econf.spec_k >= 2 else "prefix_cache"
            raise ValueError(
                f"{mode} with sliding-window serving is not supported: "
                f"request {req.rid} outgrows the window ({window})")

    def run(self, requests: List[Request], window: Optional[int] = None,
            sampler: Optional[Sampler] = None, feed=None,
            on_finish=None, on_tokens=None) -> List[Request]:
        """Continuous batching over the paged pool. Returns the finished
        requests (same objects, with .generated/.ttft/.preemptions filled).

        ``feed``: optional callable ``feed(block: bool) -> (list[Request],
        still_open: bool)`` polled every scheduler iteration — requests
        ARRIVING WHILE OTHERS RUN join the batch at the next admission
        wave (true continuous serving; engine/server.ServingEngine is the
        threaded front). With ``block=True`` (engine idle) the feed may
        wait briefly for work. The loop exits when the feed reports
        closed and all work drained. With a feed, finished Requests are
        NOT retained (the return value is empty): a long-lived serving
        loop must not grow with request count — results are delivered
        through ``on_finish``. ``on_finish``: optional callback
        invoked with each Request the moment it finishes (not at loop
        exit). With a feed, stats wall_s includes idle waits — per-request
        latency lives on the Request (ttft, t_done - t_submit).

        ``on_tokens``: optional callback ``on_tokens(req, new_tokens)``
        invoked at every materialization with the tokens appended since
        the last call (streaming delivery). Tokens only exist host-side
        at chain materializations, so granularity is chain links; while a
        request marked ``req.stream = True`` is running, chains cap at
        EngineConfig.stream_links links per materialization to bound the
        flush interval (each flush costs one host sync — that tradeoff is
        what the knob expresses)."""
        cfg, econf = self.cfg, self.econf
        page = econf.page
        window = _check_window(window, cfg)
        sampler = sampler or self._default_sampler()
        sched = Scheduler(econf.max_batch)
        # Long-lived serving must not grow with request count: finished
        # Requests are dropped after delivery (the caller holds them via
        # their Future) and the aggregates below replace whole-history
        # scans. Batch runs (no feed) keep the full list — run() returns
        # it — and at their sizes the aggregates are exact.
        retain_finished = feed is None
        n_finished = 0
        ttfts: "collections.deque" = collections.deque(maxlen=1024)

        def record_finished(r: Request) -> None:
            """Aggregate bookkeeping for every finish path; drops the
            Request from sched.finished under serving (it was appended
            by the caller/Scheduler.finish immediately before)."""
            nonlocal n_finished
            n_finished += 1
            if r.t_done is None:
                r.t_done = time.monotonic()
            if r.ttft is not None:
                ttfts.append(r.ttft)
            if not retain_finished:
                sched.finished.pop()

        def submit_one(r: Request) -> None:
            if r.cancelled:        # cancelled before it ever reached us
                r.state = State.DONE
                sched.finished.append(r)
                record_finished(r)
                if on_finish is not None:
                    on_finish(r)
                return
            self.validate_request(r, window)
            if r.max_new_tokens <= 0:
                r.state = State.DONE
                sched.finished.append(r)
                record_finished(r)
                if on_finish is not None:
                    on_finish(r)
                return
            sched.submit(r)

        # configuration rejections BEFORE the pool state is touched —
        # _paged_state() consumes the pool cache (and, under prefix
        # caching, demotes live sequences), so raising after it would
        # silently drop hundreds of MB of device state per failed call
        if econf.spec_k >= 2:
            if not sampler.greedy:
                raise ValueError(
                    "spec_k requires greedy serving: speculative "
                    "verification accepts argmax matches; rejection "
                    "sampling for the stochastic samplers is not "
                    "implemented")

        for r in requests:
            submit_one(r)

        # allocate/reuse the device pool only after every request
        # validated — a ValueError above must not drop the pool cache
        mgr, pool = self._paged_state()
        B = econf.max_batch
        pps = page.pages_per_seq
        t_start = time.monotonic()
        decode_tokens = 0
        peak_pages = 0
        iteration = 0
        # host-side wall-time breakdown (stats["t_*"]): where the engine
        # loop spends its time between device results. Dispatch buckets
        # measure HOST time to build+enqueue programs (device execution
        # is async); materialize measures the blocking device→host
        # fetches — on a relay-tunneled chip that bucket IS the ~60ms
        # sync cost, so these four numbers localize any engine-vs-device
        # throughput gap (VERDICT r2 #2's instrument).
        tacc = {"prefill_dispatch": 0.0, "chain_dispatch": 0.0,
                "materialize": 0.0}
        # per-slot count of prompt tokens DROPPED at admission (prompt
        # longer than the window attends only to its trailing `window`
        # tokens, exactly like mode "none"); cache positions are relative
        # to this base
        bases: Dict[int, int] = {}
        # per-slot count of prompt tokens served from ADOPTED cached pages
        # (prefix_cache): the suffix prefill starts at this absolute
        # position; 0 everywhere when prefix caching is off
        cached: Dict[int, int] = {}
        link_no = 0
        # device-sampling key: exists whenever device sampling is on —
        # per-chain logic passes rng=None for all-greedy batches (keeping
        # the pure-greedy trace and token stream identical) and the key
        # otherwise (uniform engine sampling, or per-request overrides)
        sample_key = (jax.random.PRNGKey(econf.seed)
                      if econf.device_sampling else None)

        # Prefix caching (PageConfig.prefix_cache): content-addressed
        # sharing of full prompt pages + suffix-only prefill
        prefix_on = page.prefix_cache
        prefix_stats = {"hit_tokens": 0, "hit_pages": 0, "registered": 0}
        # (prefix_cache/spec_k configuration rejections happen BEFORE
        # _paged_state above; the per-request "window must never
        # activate" checks for prefix_cache and spec_k live in
        # validate_request: sliding would make page content
        # position-dependent / change what verify queries attend
        # mid-stream)

        # Speculative decoding (EngineConfig.spec_k): greedy-exact by
        # construction, so it composes only with configurations whose
        # token stream IS the greedy stream
        use_spec = econf.spec_k >= 2
        spec_stats = {"steps": 0, "accepted": 0}

        def requeue_evicted(evicted: List[int], skip_slot: int = -1) -> List[int]:
            preempted = []
            for victim in set(evicted):
                if victim != skip_slot and victim in sched.running:
                    mgr.free_prompt(victim)
                    sched.preempt(victim)
                    preempted.append(victim)
            return preempted

        def apply_stop(req: Request) -> int:
            """Scan newly materialized tokens for the request's stop ids
            (watermark on the request — each token scanned once, across
            preemptions); on a hit, keep the stop token, discard the
            chain overshoot past it, and mark the request stopped.
            Returns the discarded count (callers correct decode_tokens).
            Runs BEFORE notify_tokens, so streams never see post-stop
            tokens."""
            stops = (req.stop_tokens if req.stop_tokens is not None
                     else econf.stop_tokens)
            if not stops or req.stopped:
                return 0
            gen = req.generated
            for k in range(getattr(req, "_stop_scanned", 0), len(gen)):
                if gen[k] in stops:
                    discarded = len(gen) - (k + 1)
                    del gen[k + 1:]
                    del req.logprob_values[k + 1:]
                    req.stopped = True
                    return discarded
            req._stop_scanned = len(gen)
            return 0

        def notify_tokens(req: Request) -> None:
            """Flush tokens appended since the last flush (watermark on
            the request, so it survives preemption/re-admission)."""
            if on_tokens is None or req.cancelled:
                return
            n = len(req.generated)
            sent = getattr(req, "_stream_sent", 0)
            if n > sent:
                on_tokens(req, req.generated[sent:n])
                req._stream_sent = n

        def finish_slot(slot: int) -> None:
            req = sched.finish(slot)
            record_finished(req)
            # refresh the live snapshot BEFORE the callbacks resolve the
            # request's future — a client reading /stats right after its
            # result must already see this finish counted
            update_live_stats()
            notify_tokens(req)
            if on_finish is not None:
                on_finish(req)

        def sweep_cancelled() -> None:
            """Retire requests whose `cancelled` flag was set since the
            last iteration. Safe point: no chain is in flight at the
            iteration top, so a running row's pages free wholesale here
            exactly like a finished row's (in-order device execution makes
            the reused pages safe, same argument as preemption). A cancel
            landing MID-chain is noticed by the done-sweep at that chain's
            materialization instead."""
            for req in [r for r in sched.waiting if r.cancelled]:
                sched.waiting.remove(req)
                req.state = State.DONE
                sched.finished.append(req)
                record_finished(req)
                if on_finish is not None:
                    on_finish(req)
            for slot, req in list(sched.running.items()):
                if req.cancelled:
                    mgr.free_prompt(slot)
                    finish_slot(slot)

        def update_live_stats() -> None:
            """Whole-dict swap so readers on other threads (ServingEngine
            .stats(), HTTP GET /stats) never see a partial update. O(1):
            counters only — a long-lived serving loop runs this every
            iteration, so it must not scan request history."""
            dt = time.monotonic() - t_start
            self.live_stats = {
                "running": len(sched.running),
                "waiting": len(sched.waiting),
                "finished_total": n_finished,
                "decode_tokens": decode_tokens,
                "decode_tok_per_s": decode_tokens / dt if dt > 0 else 0.0,
                "pages_free": mgr.num_free(),
                "peak_pages_used": peak_pages,
                "preemptions": sched.preempt_count,
                "uptime_s": dt,
            }

        feed_open = feed is not None
        while True:
            if feed_open:
                # drain asynchronously-arrived requests into the waiting
                # queue; they join at this iteration's admission wave.
                # When idle (no work), the feed may block briefly.
                new_reqs, feed_open = feed(not sched.has_work)
                for r in new_reqs:
                    submit_one(r)
            sweep_cancelled()
            update_live_stats()
            if not sched.has_work:
                if feed_open:
                    continue
                break
            iteration += 1
            if econf.log_every and iteration % econf.log_every == 0:
                dt = time.monotonic() - t_start
                print(f'{{"iter": {iteration}, '
                      f'"running": {len(sched.running)}, '
                      f'"waiting": {len(sched.waiting)}, '
                      f'"finished": {n_finished}, '
                      f'"pages_free": {mgr.num_free()}, '
                      f'"decode_tokens": {decode_tokens}, '
                      f'"tok_per_s": {decode_tokens / dt if dt else 0:.1f}}}',
                      flush=True)
            # ---- admission + batched prefill ---------------------------
            progressed = False
            deferred = None   # (device picks, group) — greedy first tokens
            admitted: List[Tuple[int, Request]] = []
            for slot in sched.free_slots():
                req = sched.pop_next_waiting()
                if req is None:
                    break
                base = max(0, len(req.tokens) - window)
                bases[slot] = base
                csl = 0
                if prefix_on:
                    # adopt the longest cached page chain matching this
                    # request's known tokens (prompt + any generated from a
                    # preemption), capped so ≥1 token remains to prefill
                    hit = mgr.match_prefix(req.tokens)
                    hit = hit[: (len(req.tokens) - 1) // page.page_size]
                    if hit:
                        mgr.adopt(slot, hit)
                        csl = len(hit) * page.page_size
                        prefix_stats["hit_pages"] += len(hit)
                        prefix_stats["hit_tokens"] += csl
                cached[slot] = csl
                segs, evicted = mgr.append_tokens(
                    slot, len(req.tokens) - base - csl)
                # a victim may be an EARLIER admission of this same wave:
                # its pages were freed (and may be re-allocated right here),
                # so it must be dropped from the wave or its prefill would
                # scatter K/V through a cleared block table into page 0
                for victim in requeue_evicted(evicted, skip_slot=slot):
                    admitted = [(s, r) for s, r in admitted if s != victim]
                if not segs:
                    mgr.free_prompt(slot)
                    sched.waiting.insert(0, req)  # retry once pool drains
                    break
                progressed = True
                sched.admit(req, slot)
                admitted.append((slot, req))
            # ONE padded prefill batch per admission wave: rows are padded
            # to the wave's longest bucket (valid masks drop the padding
            # scatters; attention is causal so padding never leaks) and the
            # lm_head projects only each row's true last position. Shorter
            # rows waste some prefill FLOPs, but one device round trip per
            # WAVE beats one per length bucket — mixed-length admission
            # measured 1.6k vs 3.7k tok/s when bucket-split on a tunneled
            # chip (pass last_pos=None for the reference's full-T logits).
            if admitted:
                t_pf0 = time.monotonic()
                group = admitted
                Tb = _bucket(max(len(req.tokens) - bases[slot]
                                 - cached.get(slot, 0)
                                 for slot, req in group))
                Bg = 1 << (len(group) - 1).bit_length()  # bounded recompiles
                xs = np.zeros((Bg, Tb), np.int32)
                valid = np.zeros((Bg, Tb), bool)
                tables_g = np.zeros((Bg, pps), np.int32)
                last = np.zeros(Bg, np.int32)
                offs = np.zeros(Bg, np.int32)
                for i, (slot, req) in enumerate(group):
                    skip = bases[slot] + cached.get(slot, 0)
                    n = len(req.tokens) - skip
                    xs[i, :n] = req.tokens[skip:]
                    valid[i, :n] = True
                    tables_g[i] = mgr.block_table_array(slot, pps)
                    last[i] = n - 1
                    offs[i] = cached.get(slot, 0)   # page-aligned by adopt
                pos = offs[:, None] + np.arange(Tb, dtype=np.int32)[None, :]
                pg, sl = token_coords(jnp.asarray(tables_g), jnp.asarray(pos),
                                      page.page_size, jnp.asarray(valid),
                                      page.num_pages)
                if self._tp is not None:
                    if offs.any():
                        # ≥1 row rides adopted pages (prefix cache): the
                        # TP suffix prefill attends the cached prefix
                        # through the block table on each shard
                        logits, pool = self._tp["prefill_suffix"](
                            self._tp.get("prefill_params",
                                         self._tp["params"]),
                            jnp.asarray(xs), pg, sl, pool,
                            jnp.asarray(tables_g), jnp.asarray(offs),
                            jnp.asarray(last))
                    else:
                        logits, pool = self._tp["prefill"](
                            self._tp.get("prefill_params",
                                         self._tp["params"]),
                            jnp.asarray(xs), pg, sl, pool,
                            jnp.asarray(last))
                    logits = logits[: len(group)]
                elif offs.any():
                    # ≥1 row rides adopted pages: suffix prefill attends
                    # the cached prefix through the block table (rows with
                    # offs 0 degenerate to plain prefill inside)
                    logits, pool = gpt2_paged.prefill_suffix_paged(
                        self._prefill_params or self.params,
                        jnp.asarray(xs), pg, sl, pool,
                        jnp.asarray(tables_g), jnp.asarray(offs), cfg,
                        last_pos=jnp.asarray(last),
                        use_kernel=self.use_kernel)      # (Bg, V)
                else:
                    plp_rows = [
                        (i, req) for i, (slot, req) in enumerate(group)
                        if req.prompt_logprobs
                        and not req.prompt_logprob_values
                        and not req.generated]
                    if plp_rows:
                        # echo/scoring rows ride the reference's parity
                        # path: full (B,T,V) logits (paged_infer.c:727),
                        # next-token logprobs extracted on device, ONE
                        # blocking (Bg,T-1) fetch for the wave
                        full, pool = gpt2_paged.prefill_paged(
                            self._prefill_params or self.params,
                            jnp.asarray(xs), pg, sl, pool, cfg,
                            last_pos=None)               # (Bg, T, V)
                        logits, plp_d = _prefill_plp_extract(
                            full, jnp.asarray(xs), jnp.asarray(valid),
                            jnp.asarray(last))
                        plp = np.asarray(plp_d)
                        for i, req in plp_rows:
                            req.prompt_logprob_values = [
                                float(v)
                                for v in plp[i, : len(req.prompt) - 1]]
                    else:
                        logits, pool = gpt2_paged.prefill_paged(
                            self._prefill_params or self.params,
                            jnp.asarray(xs), pg, sl, pool, cfg,
                            last_pos=jnp.asarray(last))  # (Bg, V)
                if prefix_on:
                    # publish this wave's full prompt pages for future
                    # admissions — only NOW, after the program that writes
                    # their K/V is dispatched (a same-wave evictee never
                    # prefills, so registering at admission could cache
                    # never-written pages); device execution is in-order,
                    # so any later adopter's reads see these writes
                    for slot, req in group:
                        prefix_stats["registered"] += \
                            mgr.register_prompt(slot, req.tokens)
                group_reqs = [r for _, r in group]
                group_lp = any(r.logprobs for r in group_reqs)
                if all(_effective(sampler, r)[0] for r in group_reqs) \
                        and not any(_has_penalties(r) for r in group_reqs):
                    # DEFER the host materialization: pick on device and
                    # let the first chunk chain launch before the ~60ms
                    # result download — the download then overlaps chain
                    # execution instead of idling the device
                    lg = logits[: len(group)]
                    picks_d = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                    lps_d = None
                    if group_lp:
                        lgf = lg.astype(jnp.float32)
                        lps_d = (jnp.take_along_axis(
                            lgf, picks_d[:, None], axis=-1)[:, 0]
                            - jax.scipy.special.logsumexp(lgf, axis=-1))
                    deferred = (picks_d, lps_d, list(group))
                else:
                    if any(_has_overrides(r) or _has_penalties(r)
                           for r in group_reqs):
                        first_toks = _sample_rows_per_request(
                            sampler, logits[: len(group)], group_reqs)
                    else:
                        first_toks = _sample_rows(sampler,
                                                  logits[: len(group)],
                                                  len(group))
                    lrows = (np.asarray(logits[: len(group)])
                             if group_lp else None)
                    for i, (slot, req) in enumerate(group):
                        req.generated.append(first_toks[i])
                        if req.logprobs:
                            req.logprob_values.append(
                                _row_logprob(lrows[i], first_toks[i]))
                        req.mark_first_token()
                        apply_stop(req)
                        notify_tokens(req)
                        if req.done:
                            mgr.free_prompt(slot)
                            finish_slot(slot)
                tacc["prefill_dispatch"] += time.monotonic() - t_pf0

            def flush_deferred():
                """Materialize deferred prefill picks (bookkeeping +
                done/finish). Must run before any path that reads
                req.tokens[-1] from the host or steps running slots."""
                nonlocal deferred, progressed
                if deferred is None:
                    return
                t_m0 = time.monotonic()
                picks, lps = jax.device_get((deferred[0], deferred[1]))
                picks = np.asarray(picks)
                tacc["materialize"] += time.monotonic() - t_m0
                for i, (slot, req) in enumerate(deferred[2]):
                    req.generated.append(int(picks[i]))
                    if req.logprobs and lps is not None:
                        req.logprob_values.append(float(lps[i]))
                    req.mark_first_token()
                    apply_stop(req)
                    notify_tokens(req)
                    if req.done:
                        mgr.free_prompt(slot)
                        finish_slot(slot)
                progressed = True
                deferred = None

            # ---- sliding-window page reclamation ------------------------
            # Pages whose every token slid below the attention window are
            # dead weight — free them before sizing this iteration's
            # decode (long-running window-W sequences then hold O(W/ps)
            # pages; the reference never reclaims, SURVEY §5 long-context).
            if window < page.max_context:
                for slot, req in sched.running.items():
                    start = len(req.tokens) - bases.get(slot, 0) - window
                    if start >= page.page_size:
                        mgr.release_below(slot, start)
            peak_pages = max(peak_pages, page.num_pages - mgr.num_free())

            # ---- chunked greedy decode (one device round trip per K
            # tokens; page coordinates reserved K ahead) -----------------
            chunk = 1
            # per-request overrides: a batch whose every running row is
            # EFFECTIVELY greedy chains exactly like a greedy engine; any
            # stochastic row needs device sampling to chain (the host
            # parity stream can't feed back device-side)
            all_greedy = all(_effective(sampler, r)[0]
                             for r in sched.running.values())
            row_overrides = any(_has_overrides(r)
                                for r in sched.running.values())
            chainable = all_greedy or econf.device_sampling
            # Chunk even while requests wait: once the admission pass above
            # has run, anything still waiting is blocked on slots or pages
            # either way, so single-token stepping (one ~60ms sync each on
            # a tunneled chip) would only throttle the running sequences
            # without admitting anyone sooner. Under queue pressure the
            # chain is bounded to ONE link per iteration (finished rows
            # free their slots at the next materialization) and, when the
            # block is page- rather than slot-bound, chunks shrink so the
            # admission retry comes sooner as pages free up.
            queue_blocked = bool(sched.waiting)
            # streaming consumers bound the flush interval: cap chains at
            # stream_links links while any watched request runs. Stop
            # tokens get the same bound: a stop is only DETECTED at
            # materialization, so an unbounded chain would decode the
            # row's whole remaining budget past an early stop — capping
            # trades one sync per stream_links links for bounded overshoot
            # (stops are opt-in; requests without them keep full chains)
            stream_cap = (econf.stream_links
                          if any((r.stream and on_tokens is not None)
                                 or (r.stop_tokens if r.stop_tokens
                                     is not None else econf.stop_tokens)
                                 for r in sched.running.values())
                          else 0)

            def cancel_pending() -> bool:
                """A running row was cancelled (from another thread):
                break the chain at this link so the materialization
                done-sweep retires it now, not at chain end."""
                return any(r.cancelled for r in sched.running.values())
            # Serving (feed): chains can cover a row's WHOLE remaining
            # decode in one scheduler iteration, so a request arriving
            # mid-chain would otherwise wait for the full chain to drain.
            # Polling (non-blocking) at every link boundary converts an
            # arrival into queue pressure: the chain breaks at its next
            # eligible link and the admission wave runs. (The poll is a
            # lock-free host queue check — nothing touches the device.)

            def defer_counts():
                """One not-yet-appended token per slot with a deferred
                prefill pick (recomputed per chain link — flush_deferred
                moves the token into req.generated mid-chain)."""
                return ({s: 1 for s, _ in deferred[2]} if deferred else {})

            # ---- speculative chunk chain (EngineConfig.spec_k) ----------
            # Like the greedy chain below, but each device step VERIFIES
            # spec_k tokens (carried token + device n-gram drafts) and
            # yields 1..spec_k of them. Acceptance is data-dependent, so
            # the host reserves the maximum (S*spec_k tokens per row per
            # link) up front and rolls the manager back to the accepted
            # length with truncate_to once the chain materializes.
            if use_spec and sched.running:
                flush_deferred()   # spec chains read req.tokens on the host
                S = max(1, econf.decode_chunk)
                Ksp = econf.spec_k
                TK = S * Ksp
                ps = page.page_size
                pending_spec: List = []      # (out dev, counts dev, plan)
                t_cd0 = time.monotonic()
                links = 0
                hist_d = first_d = pos0_d = None
                pre_len: Dict[int, int] = {}
                gen_before = {s: len(r.generated)
                              for s, r in sched.running.items()}
                while True:
                    plan = []
                    need_pages = 0
                    for slot, req in sched.running.items():
                        rem = req.max_new_tokens - gen_before[slot]
                        if links * S >= rem:
                            # ≥1 token accepted per step: the row has
                            # deterministically finished in earlier links
                            continue
                        ln = mgr.seq_len(slot)
                        if ln + TK > page.max_context:
                            continue   # no headroom for a full reservation
                        tail = (ps - ln % ps) % ps
                        need_pages += max(0, -(-(TK - tail) // ps))
                        plan.append(slot)
                    if not plan or need_pages > mgr.num_free():
                        break
                    for slot in plan:
                        pre_len.setdefault(slot, mgr.seq_len(slot))
                        segs, evicted = mgr.append_tokens(slot, TK)
                        if evicted:
                            raise RuntimeError(
                                "free-page guard failed: eviction inside a "
                                f"speculative chain (victims {evicted})")
                    tables = np.zeros((B, pps), np.int32)
                    for slot in plan:
                        tables[slot] = mgr.block_table_array(slot, pps)
                    if econf.debug_checks:
                        assert tables.min() >= 0 and \
                            tables.max() < page.num_pages
                    if hist_d is None:
                        hist = np.zeros((B, page.max_context + 1), np.int32)
                        first = np.zeros(B, np.int32)
                        pos0 = np.full(B, -1, np.int32)
                        for slot in plan:
                            req = sched.running[slot]
                            hist[slot, : len(req.tokens)] = req.tokens
                            first[slot] = req.tokens[-1]
                            pos0[slot] = len(req.tokens) - 1
                        hist_d, first_d = jnp.asarray(hist), jnp.asarray(first)
                        pos0_d = jnp.asarray(pos0)
                    else:
                        # deactivate rows that left the plan (capacity); a
                        # row never re-enters mid-chain
                        keep = np.zeros(B, bool)
                        keep[plan] = True
                        pos0_d = jnp.where(jnp.asarray(keep), pos0_d, -1)
                    if self._tp is not None:
                        # TP twin: same chain contract, sharded program
                        # cached like the plain TP chunks
                        key = ("spec", S, Ksp, econf.spec_ngram)
                        fn = self._tp["chunks"].get(key)
                        if fn is None:
                            fn = self._tp["sh"].make_tp_decode_chunk_spec(
                                cfg, self._tp["mesh"], num_steps=S,
                                spec_k=Ksp, ngram=econf.spec_ngram,
                                use_kernel=self.use_kernel,
                                quant_params=self._tp["quant_params"],
                                kv_quant=self._tp["kv_quant"])
                            self._tp["chunks"][key] = fn
                        out_d, counts_d, hist_d, first_d, pos0_d, pool = \
                            fn(self._tp["params"], first_d, pos0_d,
                               hist_d, pool, jnp.asarray(tables))
                    else:
                        out_d, counts_d, hist_d, first_d, pos0_d, pool = \
                            gpt2_paged.decode_chunk_spec(
                                self.params, first_d, pos0_d, hist_d, pool,
                                jnp.asarray(tables), cfg, num_steps=S,
                                spec_k=Ksp, ngram=econf.spec_ngram,
                                use_kernel=self.use_kernel)
                    pending_spec.append((out_d, counts_d, list(plan)))
                    links += 1
                    peak_pages = max(peak_pages,
                                     page.num_pages - mgr.num_free())
                    if feed_open:            # serving: arrivals break chains
                        new_reqs, feed_open = feed(False)
                        for r in new_reqs:
                            submit_one(r)
                        queue_blocked = queue_blocked or bool(sched.waiting)
                    update_live_stats()      # per-link snapshot (see below)
                    # acceptance is data-dependent: a row MAY have finished
                    # once links*S*spec_k covers its remaining budget
                    may_free = any(
                        sched.running[s].max_new_tokens - gen_before[s]
                        <= links * S * Ksp for s in plan)
                    if stream_cap and links >= stream_cap:
                        break
                    if cancel_pending():
                        break
                    if queue_blocked or \
                            ((feed_open or on_finish is not None)
                             and may_free):
                        # materialize per link under queue pressure (a row
                        # may finish ANY link; its slot/pages must release
                        # promptly for admission) and, when serving, as
                        # soon as a row may have finished (deliver its
                        # result instead of riding out the chain)
                        break
                tacc["chain_dispatch"] += time.monotonic() - t_cd0
                if pending_spec:
                    progressed = True
                    t_m0 = time.monotonic()
                    # one device→host transfer for the whole chain
                    # (tokens AND counts in one device_get — sequential
                    # np.asarray calls would pay two ~60ms round trips)
                    all_out, all_cnt = jax.device_get(
                        (jnp.stack([o for o, _, _ in pending_spec]),
                         jnp.stack([c for _, c, _ in pending_spec])))
                    tacc["materialize"] += time.monotonic() - t_m0
                    committed = {s: 0 for s in pre_len}
                    for li, (_, _, plan) in enumerate(pending_spec):
                        for slot in plan:
                            req = sched.running[slot]
                            for s_i in range(S):
                                cnt = int(all_cnt[li, s_i, slot])
                                req.generated.extend(
                                    int(t)
                                    for t in all_out[li, s_i, :cnt, slot])
                            committed[slot] += int(all_cnt[li, :, slot].sum())
                            spec_stats["steps"] += S
                    for slot, pre in pre_len.items():
                        req = sched.running[slot]
                        spec_stats["accepted"] += committed[slot]
                        mgr.truncate_to(slot, pre + committed[slot])
                        if len(req.generated) > req.max_new_tokens:
                            del req.generated[req.max_new_tokens:]  # overshoot
                        apply_stop(req)
                        decode_tokens += len(req.generated) - gen_before[slot]
                        notify_tokens(req)
                    for slot in list(sched.running):
                        if sched.running[slot].done:
                            mgr.free_prompt(slot)
                            finish_slot(slot)
                    # a row still needing tokens but WITHOUT headroom for
                    # a full S*spec_k reservation can never join a spec
                    # plan — `continue` here would starve it forever
                    # while other rows keep the spec chain busy (the
                    # plain chunk path below adapts its chunk to the
                    # remaining capacity; spec's TK cannot shrink).
                    # Fall through for exactly that case.
                    if not any(
                            r.max_new_tokens > len(r.generated)
                            and mgr.seq_len(sl) + TK > page.max_context
                            for sl, r in sched.running.items()):
                        continue
                # spec chain could not run (pool pressure / no headroom):
                # fall through — the plain chunk chain needs fewer pages
                # per link, and below it the single-token path handles
                # eviction/preemption

            dct = defer_counts()
            if chainable and sched.running:
                # capacity-bound only: rows that hit max_new mid-chunk are
                # truncated on the host (overshoot-and-discard beats paying
                # a ~60ms sync per tail token on a tunneled chip)
                cap = min(page.max_context
                          - (len(r.tokens) - bases.get(s2, 0)
                             + dct.get(s2, 0))
                          for s2, r in sched.running.items())
                dc = max(1, econf.decode_chunk)
                if queue_blocked and sched.free_slots():
                    dc = max(dc // 4, 1)   # page-blocked: shorter chunks
                for cand in (dc, max(dc // 4, 1)):
                    if cap >= cand > 1:
                        chunk = cand
                        break
            # per-chain sampling mode: all-greedy chains keep the argmax
            # trace (rng None / zeros — token streams bit-identical to a
            # greedy engine); uniform stochastic batches keep the scalar
            # static args; only batches with per-request overrides build
            # the (B,)-array transform
            chain_rng = sample_key is not None and not all_greedy
            want_lp = any(r.logprobs for r in sched.running.values())
            # penalties thread a (B, V) count plane through the chain:
            # host-built from each row's full context at chain start,
            # updated device-side per pick, re-derived next iteration
            pen_arrays = None
            if any(_has_penalties(r) for r in sched.running.values()):
                fparr = np.zeros(B, np.float32)
                pparr = np.zeros(B, np.float32)
                cnt0 = np.zeros((B, cfg.vocab_size), np.int32)
                for slot2, r2 in sched.running.items():
                    fparr[slot2] = r2.frequency_penalty
                    pparr[slot2] = r2.presence_penalty
                    np.add.at(cnt0[slot2],
                              np.clip(np.asarray(r2.tokens), 0,
                                      cfg.vocab_size - 1), 1)
                pen_arrays = (jnp.asarray(fparr), jnp.asarray(pparr))
                pen_counts_dev = jnp.asarray(cnt0)
            samp_arrays = None
            if chain_rng and row_overrides:
                tarr = np.ones(B, np.float32)
                karr = np.zeros(B, np.int32)
                garr = np.zeros(B, bool)
                kmax = 0
                for slot2, r2 in sched.running.items():
                    g2, tk2, tmp2 = _effective(sampler, r2)
                    garr[slot2] = g2
                    tarr[slot2] = tmp2 if not g2 else 1.0
                    if not g2 and tk2 and tk2 < cfg.vocab_size:
                        # tk2 >= V means 'no filter' (matching the host
                        # topk_probs bound check), NOT clamp-to-V-1 —
                        # clamping would mask the row-minimum tokens
                        karr[slot2] = tk2
                        kmax = max(kmax, tk2)
                # power-of-two cap bounds recompiles as row mixes change;
                # clamped below V so the static filter branch stays live
                # (logits are (B, V): a cap >= V would disable top-k for
                # EVERY row, not just the huge-k ones)
                kcap = (min(1 << (kmax - 1).bit_length(),
                            cfg.vocab_size - 1) if kmax else None)
                karr = np.minimum(karr, kcap or 0)
                samp_arrays = (jnp.asarray(tarr), jnp.asarray(karr),
                               jnp.asarray(garr), kcap)
            if chunk > 1 and sched.running:
                # Async chunk chain: greedy tokens feed back device-side
                # inside each chunk AND between chunks (the next chunk's
                # first_tokens is a device slice of the previous output), so
                # the host only dispatches — token values are materialised
                # ONCE after the chain. Page coordinates are decided by the
                # host allocator ahead of time (allocation is deterministic),
                # and each link is guarded by a free-page check so no
                # eviction can occur mid-chain (evictions would require
                # reading tokens back). On a relay-tunneled chip this turns
                # ~60ms of sync per chunk into one sync per chain.
                ps = page.page_size
                pending: List = []   # (toks (chunk,B), logprobs|None, [(slot, keep)])
                # running per-slot sum of pending keeps (kept in lockstep
                # with `pending` — rescanning it per slot per link made
                # dispatch O(links^2 * B^2) host work on long chains)
                pend_counts: Dict[int, int] = {}
                first_dev = None         # device (B,) — prev chain link output
                t_cd0 = time.monotonic()
                while True:
                    # rows still needing tokens, without eviction risk
                    dct = defer_counts()
                    need_pages = 0
                    plan: List[int] = []
                    for slot, req in sched.running.items():
                        rem = (req.max_new_tokens - len(req.generated)
                               - dct.get(slot, 0)
                               - pend_counts.get(slot, 0))
                        if rem <= 0:
                            continue
                        if window < page.max_context:
                            # mid-chain window reclamation: pages whose
                            # every token slid below this link's attention
                            # lower bound are dead for it AND all later
                            # links; freeing them here (not just in the
                            # outer loop) keeps a window-W sequence at
                            # O(W/ps) pages even through long chains.
                            # Safe to reallocate immediately: the device
                            # stream is in-order, so the new link's
                            # scatters into a reused page execute after
                            # every already-dispatched link's reads of it.
                            start = mgr.seq_len(slot) - window
                            if start >= ps:
                                mgr.release_below(slot, start)
                        ln = mgr.seq_len(slot)   # window-relative by design
                        if ln + chunk > page.max_context:
                            continue
                        tail = (ps - ln % ps) % ps
                        need_pages += max(0, -(-(chunk - tail) // ps))
                        plan.append(slot)
                    if not plan or need_pages > mgr.num_free():
                        break
                    first = np.zeros(B, np.int32)
                    pos0 = np.full(B, -1, np.int32)   # -1 → inactive row
                    pgs = np.full((chunk, B), page.num_pages, np.int32)
                    sls = np.zeros((chunk, B), np.int32)
                    tables = np.zeros((B, pps), np.int32)
                    stepped: List[Tuple[int, int]] = []
                    will_free = False   # a stepped row finishes this link
                    for slot in plan:
                        req = sched.running[slot]
                        # tokens already produced by earlier links of THIS
                        # chain (req.tokens/generated don't grow mid-chain)
                        pend_ct = pend_counts.get(slot, 0)
                        segs, evicted = mgr.append_tokens(slot, chunk)
                        if evicted:
                            # data-integrity guard, not a debug assert: an
                            # eviction here would scatter K/V through a
                            # cleared block table into another sequence's
                            # pages (must hold even under python -O)
                            raise RuntimeError(
                                "free-page guard failed: eviction inside a "
                                f"chunk chain (victims {evicted})")
                        coords = [(s.page, s.offset + i) for s in segs
                                  for i in range(s.count)]
                        assert len(coords) == chunk
                        first[slot] = req.tokens[-1]  # used by link 0 only
                        # (deferred slots get their device pick spliced
                        # into link_first below)
                        pos0[slot] = (len(req.tokens) - 1 + pend_ct
                                      + dct.get(slot, 0)
                                      - bases.get(slot, 0))
                        for j, (pj, sj) in enumerate(coords):
                            pgs[j, slot], sls[j, slot] = pj, sj
                        tables[slot] = mgr.block_table_array(slot, pps)
                        remaining = (req.max_new_tokens - len(req.generated)
                                     - pend_ct - dct.get(slot, 0))
                        keep = min(chunk, remaining)
                        stepped.append((slot, keep))
                        pend_counts[slot] = pend_counts.get(slot, 0) + keep
                        if remaining <= chunk:
                            will_free = True   # row finishes inside link
                    if econf.debug_checks:
                        _validate_indices(page, tables, pgs, sls)
                    if first_dev is not None:
                        link_first = first_dev
                    else:
                        link_first = jnp.asarray(first)
                        if deferred is not None:
                            dslots = jnp.asarray(
                                [s for s, _ in deferred[2]], jnp.int32)
                            link_first = link_first.at[dslots].set(
                                deferred[0])
                    link_no += 1
                    if self._tp is not None:
                        key = (chunk, window, sampler.top_k,
                               sampler.temperature)
                        fn = self._tp["chunks"].get(key)
                        if fn is None:
                            fn = self._tp["sh"].make_tp_decode_chunk(
                                cfg, self._tp["mesh"], chunk, window,
                                use_kernel=self.use_kernel,
                                top_k=sampler.top_k,
                                temperature=sampler.temperature,
                                quant_params=self._tp["quant_params"],
                                kv_quant=self._tp["kv_quant"])
                            self._tp["chunks"][key] = fn
                        # all-zeros key = greedy; otherwise the replicated
                        # per-link sampling key (every shard draws the
                        # same token from the replicated logits)
                        rng = (jnp.zeros(2, jnp.uint32)
                               if not chain_rng else
                               jax.random.fold_in(sample_key, link_no))
                        toks_out, pool = fn(
                            self._tp["params"], link_first,
                            jnp.asarray(pos0), jnp.asarray(pgs),
                            jnp.asarray(sls), jnp.asarray(tables), pool,
                            rng)
                        lp_out = None   # logprobs+TP rejected at submit
                    else:
                        pen_kw = {}
                        if pen_arrays is not None:
                            pen_kw = dict(pen_counts=pen_counts_dev,
                                          freq_pen=pen_arrays[0],
                                          pres_pen=pen_arrays[1])
                        if samp_arrays is not None:
                            # per-request transform: (B,) temperature/
                            # top-k/greedy arrays, static pow-2 top-k cap
                            tarr_d, karr_d, garr_d, kcap = samp_arrays
                            res = gpt2_paged.decode_chunk_paged(
                                self.params, link_first, jnp.asarray(pos0),
                                jnp.asarray(pgs), jnp.asarray(sls),
                                jnp.asarray(tables), pool, cfg,
                                num_steps=chunk, window=window,
                                use_kernel=self.use_kernel,
                                rng_key=jax.random.fold_in(sample_key,
                                                           link_no),
                                top_k=kcap, temperature=tarr_d,
                                k_arr=(karr_d if kcap else None),
                                greedy_rows=garr_d,
                                want_logprobs=want_lp, **pen_kw)
                        else:
                            res = gpt2_paged.decode_chunk_paged(
                                self.params, link_first, jnp.asarray(pos0),
                                jnp.asarray(pgs), jnp.asarray(sls),
                                jnp.asarray(tables), pool, cfg,
                                num_steps=chunk, window=window,
                                use_kernel=self.use_kernel,
                                rng_key=(None if not chain_rng else
                                         jax.random.fold_in(sample_key,
                                                            link_no)),
                                top_k=(sampler.top_k if chain_rng
                                       else None),
                                temperature=(sampler.temperature
                                             if chain_rng else 1.0),
                                want_logprobs=want_lp, **pen_kw)
                        toks_out, counts_out, lp_out, pool = \
                            _unpack_chunk(res, pen_arrays is not None,
                                          want_lp)
                        if counts_out is not None:
                            pen_counts_dev = counts_out
                    first_dev = toks_out[-1]
                    pending.append((toks_out, lp_out, stepped))
                    # materialize the deferred prefill picks now that the
                    # first link is queued: the fetch waits behind at most
                    # one chunk, keeping TTFT bounded while the download
                    # still overlaps chain execution (no-op after once)
                    flush_deferred()
                    # track the chain's own page allocations — the outer
                    # per-iteration sample misses them entirely (a solo
                    # request's decode pages would never be counted)
                    peak_pages = max(peak_pages,
                                     page.num_pages - mgr.num_free())
                    if feed_open:            # serving: arrivals break chains
                        new_reqs, feed_open = feed(False)
                        for r in new_reqs:
                            submit_one(r)
                        queue_blocked = queue_blocked or bool(sched.waiting)
                    # per-link snapshot: a long chain is ONE scheduler
                    # iteration, so without this /stats would freeze for
                    # its whole duration (pages_free tracks link progress)
                    update_live_stats()
                    if stream_cap and len(pending) >= stream_cap:
                        break
                    if cancel_pending():
                        break
                    if (feed_open or on_finish is not None) and will_free:
                        # serving: a stepped row finishes THIS link —
                        # materialize now so its result is delivered
                        # (on_finish) instead of riding to the chain's
                        # natural end. One sync per FINISHING request,
                        # not per link: solo long streams still chain.
                        break
                    if queue_blocked and \
                            (will_free or window < page.max_context
                             or sched.free_slots()):
                        # bounded chain under queue pressure: materialize
                        # as soon as a row can actually finish, so its
                        # slot/pages release and the waiting queue gets
                        # its admission retry. While NO row can finish
                        # this link (finish is deterministic: greedy runs
                        # to max_new_tokens), breaking would only buy a
                        # useless ~60ms sync per link — keep chaining.
                        # EXCEPT when (a) window mode: pages also free
                        # WITHOUT a finish (release_below reclaims
                        # slid-out pages, outer loop only), or (b) a slot
                        # is ALREADY free (a row finished outside the
                        # plan — deferred max_new=1 picks land in
                        # flush_deferred above) — keep the one-link bound
                        # there so admission gets its retry.
                        break
                tacc["chain_dispatch"] += time.monotonic() - t_cd0
                if pending:
                    progressed = True
                    # deferred first tokens precede the chain's picks
                    flush_deferred()
                    t_m0 = time.monotonic()
                    # one device→host transfer for the whole chain
                    # (device_get fetches tokens AND logprobs together —
                    # two sequential np.asarray calls would pay a second
                    # ~60ms tunnel round trip)
                    all_picks, all_lps = jax.device_get(
                        (jnp.stack([t for t, _, _ in pending]),
                         (jnp.stack([l for _, l, _ in pending])
                          if pending[0][1] is not None else None)))
                    all_picks = np.asarray(all_picks)
                    tacc["materialize"] += time.monotonic() - t_m0
                    for li, (picks, (_, _, stepped)) in enumerate(
                            zip(all_picks, pending)):
                        for slot, keep in stepped:
                            req = sched.running.get(slot)
                            if req is None or req.stopped:
                                # finished at flush_deferred (its FIRST
                                # token hit a stop id): the chain's picks
                                # for it are overshoot — discard
                                continue
                            req.generated.extend(int(t)
                                                 for t in picks[:keep, slot])
                            if req.logprobs and all_lps is not None:
                                req.logprob_values.extend(
                                    float(v)
                                    for v in all_lps[li, :keep, slot])
                            decode_tokens += keep
                    for slot in {s for _, _, st in pending for s, _ in st}:
                        req = sched.running.get(slot)
                        if req is None:
                            continue
                        decode_tokens -= apply_stop(req)
                        notify_tokens(req)
                    for slot in list(sched.running):
                        if sched.running[slot].done:
                            mgr.free_prompt(slot)
                            finish_slot(slot)
                    continue
                # chain could not run (pool pressure): single-token path
                # below handles eviction/preemption
                chunk = 1

            # ---- single-token decode step (parity sampling path) -------
            flush_deferred()   # this path reads req.tokens[-1] on the host
            if sched.running:
                toks = np.zeros(B, np.int32)
                wpe_pos = np.zeros(B, np.int32)
                pg = np.full(B, page.num_pages, np.int32)
                sl = np.zeros(B, np.int32)
                lengths = np.zeros(B, np.int32)
                starts = np.zeros(B, np.int32)
                tables = np.zeros((B, pps), np.int32)
                stepped: List[int] = []
                for slot, req in list(sched.running.items()):
                    if slot not in sched.running:
                        # preempted by an earlier slot's eviction THIS
                        # iteration (the items() snapshot is stale) — it
                        # must not allocate pages or step
                        continue
                    segs, evicted = mgr.append_tokens(slot, 1)
                    # a victim may already be staged in this batch: its pages
                    # were freed (and may be re-allocated right here), so its
                    # row must be neutralized or its K/V scatter would
                    # corrupt the new owner's page
                    for victim in requeue_evicted(evicted, skip_slot=slot):
                        if victim in stepped:
                            stepped.remove(victim)
                            pg[victim] = page.num_pages
                            lengths[victim] = 0
                    if not segs:
                        mgr.free_prompt(slot)
                        sched.preempt(slot)
                        continue
                    pos = len(req.tokens) - 1 - bases.get(slot, 0)
                    toks[slot] = req.tokens[-1]
                    wpe_pos[slot] = min(pos, window - 1)
                    pg[slot], sl[slot] = segs[0].page, segs[0].offset
                    lengths[slot] = pos + 1
                    starts[slot] = max(0, pos + 1 - window)
                    tables[slot] = mgr.block_table_array(slot, pps)
                    stepped.append(slot)
                if stepped:
                    progressed = True
                    if econf.debug_checks:
                        _validate_indices(page, tables, pg[None], sl[None],
                                          lengths)
                    if self._tp is not None:
                        logits, pool = self._tp["decode"](
                            self._tp["params"], jnp.asarray(toks),
                            jnp.asarray(wpe_pos), jnp.asarray(pg),
                            jnp.asarray(sl), jnp.asarray(tables),
                            jnp.asarray(lengths), jnp.asarray(starts), pool)
                    else:
                        logits, pool = gpt2_paged.decode_step_paged(
                            self.params, jnp.asarray(toks),
                            jnp.asarray(wpe_pos), jnp.asarray(pg),
                            jnp.asarray(sl), jnp.asarray(tables),
                            jnp.asarray(lengths), pool, cfg,
                            use_kernel=self.use_kernel,
                            starts=jnp.asarray(starts))
                    decode_tokens += len(stepped)
                    # rows gathered in `stepped` order so the parity RNG
                    # stream is consumed per stepped row, in order
                    step_reqs = [sched.running[s] for s in stepped]
                    step_logits = logits[jnp.asarray(stepped)]
                    t_m0 = time.monotonic()
                    if any(_has_overrides(r) or _has_penalties(r)
                           for r in step_reqs):
                        row_toks = _sample_rows_per_request(
                            sampler, step_logits, step_reqs)
                    else:
                        row_toks = _sample_rows(
                            sampler, step_logits, len(stepped))
                    lrows = (np.asarray(step_logits)
                             if any(r.logprobs for r in step_reqs)
                             else None)
                    tacc["materialize"] += time.monotonic() - t_m0
                    for i, (slot, tok) in enumerate(zip(stepped, row_toks)):
                        req = sched.running[slot]
                        req.generated.append(tok)
                        if req.logprobs:
                            req.logprob_values.append(
                                _row_logprob(lrows[i], tok))
                        apply_stop(req)
                        notify_tokens(req)
                        if req.done:
                            mgr.free_prompt(slot)
                            finish_slot(slot)

            if not progressed and not sched.running:
                raise RuntimeError(
                    "scheduler stalled: pool too small for any waiting "
                    "request (need a larger page pool or shorter prompts)")

        self._pool_cache = pool     # reuse the device buffers next run
        update_live_stats()
        dt = time.monotonic() - t_start
        self.stats = {
            "wall_s": dt,
            "decode_tokens": decode_tokens,
            "decode_tok_per_s": decode_tokens / dt if dt > 0 else 0.0,
            "peak_pages_used": peak_pages,
            "preemptions": sched.preempt_count,
            # last 1024 finishes — exact for batch runs, a recent-window
            # median for long-lived serving (full history is not retained)
            "p50_ttft_s": float(np.median(ttfts)) if ttfts else 0.0,
            # host wall-time breakdown (see tacc comment above): the
            # remainder vs wall_s is scheduler/manager bookkeeping + idle
            "t_prefill_dispatch_s": round(tacc["prefill_dispatch"], 4),
            "t_chain_dispatch_s": round(tacc["chain_dispatch"], 4),
            "t_materialize_s": round(tacc["materialize"], 4),
        }
        if use_spec:
            self.stats["spec_steps"] = spec_stats["steps"]
            # committed tokens per verify step (incl. overshoot): the raw
            # acceptance of the drafting mechanism, in [1, spec_k]
            self.stats["spec_tok_per_step"] = round(
                spec_stats["accepted"] / spec_stats["steps"], 3) \
                if spec_stats["steps"] else 0.0
        if prefix_on:
            # prompt tokens served from adopted cached pages (their
            # prefill was skipped entirely) + cache occupancy after the run
            self.stats["prefix_hit_tokens"] = prefix_stats["hit_tokens"]
            self.stats["prefix_hit_pages"] = prefix_stats["hit_pages"]
            self.stats["prefix_pages_registered"] = \
                prefix_stats["registered"]
            self.stats["prefix_cached_pages"] = mgr.num_cached()
        return sched.finished

    def warmup(self, window: Optional[int] = None) -> Dict[str, float]:
        """Pre-compile the paged serving executables by running tiny
        throwaway requests through every path this engine's config can
        reach: the smallest prefill bucket + the decode-chunk chain (and
        its logprobs variant when serve_logprobs) + the single-token
        step for parity-sampler engines. A cold 1.5B chunk compile takes
        minutes — paying it BEFORE the server binds its port keeps the
        first tenant (and, for the logprobs variant, every tenant
        sharing the loop with the first logprobs request) from stalling
        on it. Returns {stage: seconds}. The pool and compile caches
        persist, so warmed requests cost nothing afterwards."""
        if self.econf.cache_mode != "paged":
            return {}
        timings: Dict[str, float] = {}
        prompt = list(range(1, 9))      # bucket 16, any ids work
        new = max(2, min(self.econf.decode_chunk + 2,
                         self.econf.page.max_context - len(prompt)))

        def one(tag: str, **kw) -> None:
            t0 = time.monotonic()
            # stop_tokens=[] overrides any engine default: a junk pick
            # landing on a stop id would finish the request at prefill
            # and the decode-chunk executable would never compile —
            # defeating warmup's whole purpose
            self.run([Request(rid=-1, prompt=list(prompt),
                              max_new_tokens=new, stop_tokens=[], **kw)],
                     window=window)
            timings[tag] = round(time.monotonic() - t0, 3)

        one("default")                  # prefill bucket + chunk/step path
        if self.econf.serve_logprobs and self._tp is None:
            if self.econf.spec_k < 2:
                one("logprobs", logprobs=True)
            if not self.econf.page.prefix_cache:
                one("prompt_logprobs", prompt_logprobs=True)
        return timings

    # -- dispatch ------------------------------------------------------------

    def generate(self, prompt: Sequence[int], max_new_tokens: int,
                 window: Optional[int] = None,
                 sampler: Optional[Sampler] = None) -> List[int]:
        mode = self.econf.cache_mode
        fn = {"none": self.generate_nocache,
              "dense": self.generate_dense,
              "paged": self.generate_paged}[mode]
        return fn(prompt, max_new_tokens, window=window, sampler=sampler)
