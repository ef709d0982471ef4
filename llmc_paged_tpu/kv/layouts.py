"""L3 device side: the KV page pool as dense device arrays.

The reference stores each page as two malloc'd float buffers inside the
manager (KVBlock.keys/values, block_manager.c:9-15, lazily allocated at
:145-146). There is no user pointer arithmetic on TPU, so the pool is
preallocated dense device arrays — one K and one V buffer PER LAYER:

    L x (num_pages, NH, HS, page_size)

* PAGE-major (leading P axis) so one page of all local heads is ONE
  contiguous block the flash-decode kernel's manual DMA fetches with a
  single leading-dim slice (`pool.at[page]`);
* TRANSPOSED minor dims (HS, page_size): Mosaic async-copy slices
  require the minor dims (sublane, lane) to be (8k, 128k)-aligned, and
  GPT-2's HS=64 cannot be a lane dim — (HS=64, ps=128) satisfies both.
  The serving page size is therefore 128 tokens (ps % 128 == 0 for the
  DMA kernel; other sizes fall back to the grid-pipelined kernel). The
  dots come out cleaner too: scores contract HS with ps outputs on
  lanes, attention-weighted V contracts ps;
* tensor parallelism shards heads via P(None, "model", None, None) —
  each shard still sees its local heads contiguously.

Writes are jit-compatible scatters addressed by (page, slot) coordinates
computed from the host block tables; invalid rows use out-of-range indices
with mode='drop' so padding never corrupts page 0.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from llmc_paged_tpu.config import GPT2Config, PageConfig


class PagePool(NamedTuple):
    """Per-layer K/V page buffers: ``k``/``v`` are length-L tuples of
    (P, NH, HS, page_size) arrays (page-major, token-minor — see module
    docstring).

    One buffer PER LAYER (not one stacked (L, ...) array) is a measured
    performance decision: with separate buffers the unrolled layer loop
    updates each one with a static-index scatter that XLA performs in
    place, whereas a stacked pool must either stream layer planes through
    lax.scan xs/ys (copies the whole pool every decode step, ~1.6ms at
    124M fp32) or be carried whole (scatter not done in place, 6x slower)
    — see ops/dev/probe_decode.py chunk_suite_unrolled."""
    k: Tuple[jax.Array, ...]  # L x (P, NH, HS, page_size)
    v: Tuple[jax.Array, ...]

    @property
    def num_layers(self) -> int:
        return len(self.k)

    @property
    def num_pages(self) -> int:
        return self.k[0].shape[0]

    @property
    def page_size(self) -> int:
        return self.k[0].shape[3]

    def layer(self, i: int) -> Tuple[jax.Array, ...]:
        return (self.k[i], self.v[i])

    def with_layer(self, i: int, new: Tuple[jax.Array, ...]) -> "PagePool":
        return PagePool(self.k[:i] + (new[0],) + self.k[i + 1:],
                        self.v[:i] + (new[1],) + self.v[i + 1:])


class QuantPagePool(NamedTuple):
    """INT8 KV pages with per-(token-row, head) symmetric scales, as
    per-layer buffer tuples (see PagePool for why).

    Pages are (P, NH, HS, page_size) like PagePool; scales are
    (P, NH, page_size) f32 — small enough that the decode kernel keeps
    the WHOLE scale array in VMEM and indexes it by page directly."""
    k: Tuple[jax.Array, ...]        # L x (P, NH, HS, page_size) int8
    v: Tuple[jax.Array, ...]
    k_scale: Tuple[jax.Array, ...]  # L x (P, NH, page_size) f32
    v_scale: Tuple[jax.Array, ...]

    @property
    def num_layers(self) -> int:
        return len(self.k)

    @property
    def num_pages(self) -> int:
        return self.k[0].shape[0]

    @property
    def page_size(self) -> int:
        return self.k[0].shape[3]

    def layer(self, i: int) -> Tuple[jax.Array, ...]:
        return (self.k[i], self.v[i], self.k_scale[i], self.v_scale[i])

    def with_layer(self, i: int,
                   new: Tuple[jax.Array, ...]) -> "QuantPagePool":
        return QuantPagePool(
            self.k[:i] + (new[0],) + self.k[i + 1:],
            self.v[:i] + (new[1],) + self.v[i + 1:],
            self.k_scale[:i] + (new[2],) + self.k_scale[i + 1:],
            self.v_scale[:i] + (new[3],) + self.v_scale[i + 1:])


def init_pool(cfg: GPT2Config, page: PageConfig, dtype=jnp.float32):
    L = cfg.num_layers
    shape = (page.num_pages, cfg.num_heads, cfg.head_dim, page.page_size)
    if dtype == jnp.int8 or dtype == "int8":
        sshape = (page.num_pages, cfg.num_heads, page.page_size)
        return QuantPagePool(
            tuple(jnp.zeros(shape, jnp.int8) for _ in range(L)),
            tuple(jnp.zeros(shape, jnp.int8) for _ in range(L)),
            tuple(jnp.ones(sshape, jnp.float32) for _ in range(L)),
            tuple(jnp.ones(sshape, jnp.float32) for _ in range(L)))
    return PagePool(tuple(jnp.zeros(shape, dtype) for _ in range(L)),
                    tuple(jnp.zeros(shape, dtype) for _ in range(L)))


def quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 over the last axis: x (..., HS) →
    (int8 (..., HS), scale f32 (...))."""
    absmax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0).astype(jnp.float32)
    xq = jnp.clip(jnp.round(x / scale[..., None]), -127, 127).astype(jnp.int8)
    return xq, scale


def write_layer_kv_quant(pool_l: Tuple[jax.Array, ...],
                         k_new: jax.Array, v_new: jax.Array,
                         page: jax.Array, slot: jax.Array):
    """Quantize-and-scatter new K/V rows into one layer's int8 pool slices
    (k, v, k_scale, v_scale), coordinates as in write_layer_kv."""
    k_l, v_l, ks_l, vs_l = pool_l
    kq, ks = quantize_rows(k_new)   # (N, NH, HS) int8, (N, NH)
    vq, vs = quantize_rows(v_new)
    k_l = k_l.at[page, :, :, slot].set(kq, mode="drop")
    v_l = v_l.at[page, :, :, slot].set(vq, mode="drop")
    ks_l = ks_l.at[page, :, slot].set(ks, mode="drop")
    vs_l = vs_l.at[page, :, slot].set(vs, mode="drop")
    return k_l, v_l, ks_l, vs_l


def _page_blocks(k: jax.Array, ps: int) -> jax.Array:
    """(B, Tp, NH, HS) token-major rows → (B*(Tp/ps), NH, HS, ps) page
    blocks in the pool's transposed layout."""
    B, Tp, NH, HS = k.shape
    n = Tp // ps
    return (k.reshape(B, n, ps, NH, HS).transpose(0, 1, 3, 4, 2)
            .reshape(B * n, NH, HS, ps))


def prompt_page_ids(page: jax.Array, T: int, ps: int,
                    num_pages: int) -> jax.Array:
    """Per-PAGE pool ids from prefill's per-token page coordinates:
    page (B, T) (with num_pages as the invalid-token sentinel) →
    (B, ceil(T/ps)) ids, sentinel where the page-chunk starts beyond T
    or on an invalid token."""
    n = -(-T // ps)
    cols = [page[:, j * ps] if j * ps < T
            else jnp.full_like(page[:, 0], num_pages)
            for j in range(n)]
    return jnp.stack(cols, axis=1)


def write_prompt_pages(k_pool_l: jax.Array, v_pool_l: jax.Array,
                       k: jax.Array, v: jax.Array, page_ids: jax.Array
                       ) -> Tuple[jax.Array, jax.Array]:
    """Page-granular prefill writes: k/v (B, Tp, NH, HS) with Tp a
    multiple of ps; page_ids (B, Tp/ps) pool ids (drop sentinel =
    num_pages for padding rows / chunks). ONE leading-dim scatter of
    whole (NH, HS, ps) page blocks replaces Tp per-token lane-column
    scatters (prompt pages are freshly allocated, so whole-page
    overwrite is safe; slots beyond the prompt hold garbage that length
    masking hides until decode overwrites them)."""
    ps = k_pool_l.shape[3]
    ids = page_ids.reshape(-1)
    k_pool_l = k_pool_l.at[ids].set(
        _page_blocks(k, ps).astype(k_pool_l.dtype), mode="drop")
    v_pool_l = v_pool_l.at[ids].set(
        _page_blocks(v, ps).astype(v_pool_l.dtype), mode="drop")
    return k_pool_l, v_pool_l


def write_prompt_pages_quant(pool_l: Tuple[jax.Array, ...],
                             k: jax.Array, v: jax.Array,
                             page_ids: jax.Array) -> Tuple[jax.Array, ...]:
    """INT8 twin of write_prompt_pages (per-token quantization, one
    page-granular scatter for values and one for scales)."""
    k_l, v_l, ks_l, vs_l = pool_l
    B, Tp, NH, HS = k.shape
    ps = k_l.shape[3]
    n = Tp // ps
    ids = page_ids.reshape(-1)
    kq, ks = quantize_rows(k)       # (B, Tp, NH) scales
    vq, vs = quantize_rows(v)
    k_l = k_l.at[ids].set(_page_blocks(kq, ps), mode="drop")
    v_l = v_l.at[ids].set(_page_blocks(vq, ps), mode="drop")
    sblk = lambda s: (s.reshape(B, n, ps, NH).transpose(0, 1, 3, 2)
                      .reshape(B * n, NH, ps))
    ks_l = ks_l.at[ids].set(sblk(ks), mode="drop")
    vs_l = vs_l.at[ids].set(sblk(vs), mode="drop")
    return k_l, v_l, ks_l, vs_l


def quantize_pages(k_pages: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Quantize a float (P, NH, HS, ps) page buffer per TOKEN row (the
    same per-row formula as quantize_rows, reducing over HS which is
    axis -2 in the transposed page layout). Returns (int8 pages, scales
    (P, NH, ps))."""
    kq, ks = quantize_rows(k_pages.swapaxes(-1, -2))
    return kq.swapaxes(-1, -2), ks


def dequant_layer(k_l: jax.Array, ks_l: jax.Array) -> jax.Array:
    """(P, NH, HS, ps) int8 + (P, NH, ps) scales → f32."""
    return k_l.astype(jnp.float32) * ks_l[:, :, None, :]


def token_coords(block_tables: jax.Array, positions: jax.Array,
                 page_size: int, valid: jax.Array,
                 num_pages: int) -> Tuple[jax.Array, jax.Array]:
    """Map per-token positions to pool coordinates.

    block_tables: (B, pages_per_seq) int32; positions: (B, ...) int32 token
    positions within each sequence; valid: same shape bool. Returns
    (page, slot) with page == num_pages (out of range → dropped scatter)
    where invalid."""
    pages_per_seq = block_tables.shape[1]
    page_idx = positions // page_size
    # positions beyond the table are DROPPED, not clipped — clipping would
    # silently overwrite the last page's K/V with an out-of-capacity token
    in_range = (page_idx >= 0) & (page_idx < pages_per_seq)
    safe_idx = jnp.clip(page_idx, 0, pages_per_seq - 1)
    page = jnp.take_along_axis(
        block_tables, safe_idx.reshape(block_tables.shape[0], -1), axis=1
    ).reshape(positions.shape)
    slot = positions % page_size
    page = jnp.where(valid & in_range, page, num_pages)
    return page.astype(jnp.int32), slot.astype(jnp.int32)


def _commit_tiles(pages: jax.Array, slots: jax.Array, ps: int,
                  num_pages: int):
    """Tile bookkeeping for the page-granular chunk commit.

    pages/slots are (K, B) per-sub-step coordinates. PRECONDITION
    (engine/allocator contract): down each column, equal pages are
    grouped consecutively (slots fill a page monotonically before moving
    on — BlockManager appends never revisit a page), with an optional
    trailing drop-sentinel run (rejected speculative rows / inactive
    rows). Returns (g_oh (K,B,G') f32 tile one-hot, s_oh (K,B,ps) f32
    slot one-hot, upages (B*G',) per-tile pool ids, sentinel where the
    tile is unused). Coordinates violating the grouping contract fall
    off the G' tiles and are DROPPED, same as an out-of-range page in
    the scatter path."""
    K, B = pages.shape
    # distinct pages a K-token column can touch: ceil(K/ps)+1 when the
    # run starts mid-page, +1 more for a trailing sentinel group
    maxp = -(-K // ps) + 2
    newpage = jnp.concatenate(
        [jnp.ones((1, B), bool), pages[1:] != pages[:-1]], axis=0)
    tid = jnp.cumsum(newpage.astype(jnp.int32), axis=0) - 1     # (K, B)
    bidx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[None, :],
                            (K, B))
    upages = jnp.full((B, maxp), num_pages, jnp.int32)
    upages = upages.at[bidx, tid].set(pages, mode="drop")
    g_oh = jax.nn.one_hot(tid, maxp, dtype=jnp.float32)         # (K,B,G')
    s_oh = jax.nn.one_hot(slots, ps, dtype=jnp.float32)         # (K,B,ps)
    return g_oh, s_oh, upages.reshape(-1)


def _commit_buffer(pool_l: jax.Array, rows: jax.Array, g_oh: jax.Array,
                   s_oh: jax.Array, upages: jax.Array) -> jax.Array:
    """Merge (K, B, NH, HS) rows into pool_l (P, NH, HS, ps) at the
    tiles described by _commit_tiles: gather the touched pages (leading-
    dim take), blend the new rows in DENSELY (one-hot einsum — sums have
    at most one nonzero term, so values pass through EXACTLY in f32),
    scatter whole pages back (leading-dim, full-window).

    This shape of commit exists for layout reasons, not elegance: the
    natural per-token scatter `pool.at[page, :, :, slot].set(rows)`
    makes XLA:TPU assign the scatter operand a transposed layout
    ({2,1,3,0}) while the Mosaic attention kernel and the jit boundary
    require the default {3,2,1,0} — the compiler then inserts TWO
    whole-pool transposing copies per buffer per chunk call (measured
    r5: 48 pool + 72 scale copies, 453+42 MB per 124M chunk call,
    step time scaling ~2us/page with POOL size at constant live range).
    Every op here is leading-dim indexed or dense, so all layouts stay
    default and the commit cost is proportional to the TOUCHED pages
    only."""
    P, NH, HS, ps = pool_l.shape
    safe = jnp.clip(upages, 0, P - 1)
    tiles = jnp.take(pool_l, safe, axis=0).astype(jnp.float32)
    ins = jnp.einsum("kbg,kbs,kbnh->bgnhs", g_oh, s_oh,
                     rows.astype(jnp.float32))
    mask = jnp.einsum("kbg,kbs->bgs", g_oh, s_oh)
    tiles = (tiles * (1.0 - mask.reshape(-1, ps)[:, None, None, :])
             + ins.reshape(-1, NH, HS, ps))
    return pool_l.at[upages].set(tiles.astype(pool_l.dtype), mode="drop")


def _commit_scales(sc_l: jax.Array, srows: jax.Array, g_oh: jax.Array,
                   s_oh: jax.Array, upages: jax.Array) -> jax.Array:
    """Scale twin of _commit_buffer: srows (K, B, NH) into (P, NH, ps).

    KNOWN RESIDUAL (r5, measured in HLO): the 3D (P, NH, ps) page
    scatter makes XLA:TPU pick layout {2,0,1} for the operand — two
    transposing copies per scale buffer per chunk (~28 MB/chunk at 124M
    mult4, ~0.1 ms/step-order at 1.5B long-ctx). The scatter below runs
    on a (P, NH, 1, ps) view hoping to join the pool buffers' 4D shape
    class (which keeps the default layout), but XLA CANONICALIZES the
    reshape away before layout assignment — the compiled HLO is
    byte-identical with or without it (docs/TPU_RUNS.md r5). Kept for
    documentation; a real fix needs the scale buffers stored 4D
    end-to-end or a Pallas commit write."""
    P, NH, ps = sc_l.shape
    safe = jnp.clip(upages, 0, P - 1)
    tiles = jnp.take(sc_l, safe, axis=0)
    ins = jnp.einsum("kbg,kbs,kbn->bgns", g_oh, s_oh, srows)
    mask = jnp.einsum("kbg,kbs->bgs", g_oh, s_oh)
    tiles = (tiles * (1.0 - mask.reshape(-1, ps)[:, None, :])
             + ins.reshape(-1, NH, ps))
    sc4 = sc_l.reshape(P, NH, 1, ps)
    sc4 = sc4.at[upages].set(tiles.reshape(-1, NH, 1, ps), mode="drop")
    return sc4.reshape(P, NH, ps)


def commit_layer_kv(k_pool_l: jax.Array, v_pool_l: jax.Array,
                    tails_k: jax.Array, tails_v: jax.Array,
                    pages: jax.Array, slots: jax.Array
                    ) -> Tuple[jax.Array, jax.Array]:
    """Chunk-commit of (K, B, NH, HS) tail K/V into one layer's float
    pool at (K, B) coordinates — the layout-neutral replacement for
    flattening the tails and calling write_layer_kv (see _commit_buffer
    for why). Values land bit-identically to the scatter path."""
    g_oh, s_oh, up = _commit_tiles(pages, slots, k_pool_l.shape[3],
                                   k_pool_l.shape[0])
    return (_commit_buffer(k_pool_l, tails_k, g_oh, s_oh, up),
            _commit_buffer(v_pool_l, tails_v, g_oh, s_oh, up))


def commit_layer_kv_quant(pool_l: Tuple[jax.Array, ...],
                          tails_k: jax.Array, tails_v: jax.Array,
                          pages: jax.Array, slots: jax.Array
                          ) -> Tuple[jax.Array, ...]:
    """INT8 twin of commit_layer_kv: per-token quantization (identical
    formula to write_layer_kv_quant — int8 values and f32 scales pass
    through the one-hot einsum exactly), four leading-dim page
    scatters."""
    k_l, v_l, ks_l, vs_l = pool_l
    kq, ks = quantize_rows(tails_k)     # (K,B,NH,HS) int8, (K,B,NH) f32
    vq, vs = quantize_rows(tails_v)
    g_oh, s_oh, up = _commit_tiles(pages, slots, k_l.shape[3],
                                   k_l.shape[0])
    return (_commit_buffer(k_l, kq, g_oh, s_oh, up),
            _commit_buffer(v_l, vq, g_oh, s_oh, up),
            _commit_scales(ks_l, ks, g_oh, s_oh, up),
            _commit_scales(vs_l, vs, g_oh, s_oh, up))


def write_layer_kv(k_pool_l: jax.Array, v_pool_l: jax.Array,
                   k_new: jax.Array, v_new: jax.Array,
                   page: jax.Array, slot: jax.Array
                   ) -> Tuple[jax.Array, jax.Array]:
    """Scatter new K/V rows into one layer's pool.

    k_pool_l/v_pool_l: (P, NH, HS, ps); k_new/v_new: (N, NH, HS) with
    coordinate vectors page/slot: (N,). Rows whose page is out of range are
    dropped (the invalid-token convention of token_coords). The advanced
    indices (page, slot) land in front, so the update operand is k_new's
    natural (N, NH, HS)."""
    k_pool_l = k_pool_l.at[page, :, :, slot].set(
        k_new.astype(k_pool_l.dtype), mode="drop")
    v_pool_l = v_pool_l.at[page, :, :, slot].set(
        v_new.astype(v_pool_l.dtype), mode="drop")
    return k_pool_l, v_pool_l


def gather_layer_kv(k_pool_l: jax.Array, v_pool_l: jax.Array,
                    block_tables: jax.Array
                    ) -> Tuple[jax.Array, jax.Array]:
    """Oracle gather: block tables → contiguous (B, NH, S, HS) K/V, where
    S = pages_per_seq * page_size. This is the copy the reference names as
    the thing to eliminate (fill_from_kv_cache, cached_infer.c:663-665) —
    used only as the test oracle and XLA fallback path; the Pallas kernel
    reads pages in place."""
    B, pages_per_seq = block_tables.shape
    P, NH, HS, ps = k_pool_l.shape
    k = jnp.take(k_pool_l, block_tables, axis=0)   # (B, pages, NH, HS, ps)
    v = jnp.take(v_pool_l, block_tables, axis=0)
    k = k.transpose(0, 2, 1, 4, 3).reshape(B, NH, pages_per_seq * ps, HS)
    v = v.transpose(0, 2, 1, 4, 3).reshape(B, NH, pages_per_seq * ps, HS)
    return k, v
