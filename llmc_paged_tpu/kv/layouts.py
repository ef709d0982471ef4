"""L3 device side: the KV page pool as dense device arrays.

The reference stores each page as two malloc'd float buffers inside the
manager (KVBlock.keys/values, block_manager.c:9-15, lazily allocated at
:145-146). There is no user pointer arithmetic on TPU, so the pool is one
preallocated dense array per K and V:

    (L, NH, num_pages, page_size, HS)

* head-major so tensor parallelism shards pages over heads with
  P(None, "model", None, None, None) and the paged-attention kernel grids
  over (head, batch) with contiguous (page_size, HS) tiles;
* (page_size, HS) as the two minor dims so a page is a contiguous
  (sublane × lane) tile — page_size ≥ 8 and HS a multiple of 128 (or
  padded) keeps pages aligned to fp32 (8,128) tiling.

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
    k: jax.Array  # (L, NH, P, page_size, HS)
    v: jax.Array

    @property
    def num_pages(self) -> int:
        return self.k.shape[2]

    @property
    def page_size(self) -> int:
        return self.k.shape[3]


class QuantPagePool(NamedTuple):
    """INT8 KV pages with per-(token-row, head) symmetric scales.

    Scales are stored (L, NH, P, 1, page_size) — the trailing (1, ps) block
    shape keeps Mosaic's last-two-dims tiling rule satisfied when the
    kernel fetches one page's scales alongside the page."""
    k: jax.Array        # (L, NH, P, page_size, HS) int8
    v: jax.Array
    k_scale: jax.Array  # (L, NH, P, 1, page_size) f32
    v_scale: jax.Array

    @property
    def num_pages(self) -> int:
        return self.k.shape[2]

    @property
    def page_size(self) -> int:
        return self.k.shape[3]


def init_pool(cfg: GPT2Config, page: PageConfig, dtype=jnp.float32):
    shape = (cfg.num_layers, cfg.num_heads, page.num_pages, page.page_size,
             cfg.head_dim)
    if dtype == jnp.int8 or dtype == "int8":
        sshape = shape[:3] + (1, page.page_size)
        return QuantPagePool(jnp.zeros(shape, jnp.int8),
                             jnp.zeros(shape, jnp.int8),
                             jnp.ones(sshape, jnp.float32),
                             jnp.ones(sshape, jnp.float32))
    return PagePool(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


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
    k_l = k_l.at[:, page, slot].set(kq.transpose(1, 0, 2), mode="drop")
    v_l = v_l.at[:, page, slot].set(vq.transpose(1, 0, 2), mode="drop")
    ks_l = ks_l.at[:, page, 0, slot].set(ks.T, mode="drop")
    vs_l = vs_l.at[:, page, 0, slot].set(vs.T, mode="drop")
    return k_l, v_l, ks_l, vs_l


def dequant_layer(k_l: jax.Array, ks_l: jax.Array) -> jax.Array:
    """(NH, P, ps, HS) int8 + (NH, P, 1, ps) scales → f32."""
    return k_l.astype(jnp.float32) * ks_l[:, :, 0, :, None]


def token_coords(block_tables: jax.Array, positions: jax.Array,
                 page_size: int, valid: jax.Array,
                 num_pages: int) -> Tuple[jax.Array, jax.Array]:
    """Map per-token positions to pool coordinates.

    block_tables: (B, pages_per_seq) int32; positions: (B, ...) int32 token
    positions within each sequence; valid: same shape bool. Returns
    (page, slot) with page == num_pages (out of range → dropped scatter)
    where invalid."""
    pages_per_seq = block_tables.shape[1]
    page_idx = jnp.clip(positions // page_size, 0, pages_per_seq - 1)
    page = jnp.take_along_axis(
        block_tables, page_idx.reshape(block_tables.shape[0], -1), axis=1
    ).reshape(positions.shape)
    slot = positions % page_size
    page = jnp.where(valid, page, num_pages)
    return page.astype(jnp.int32), slot.astype(jnp.int32)


def write_layer_kv(k_pool_l: jax.Array, v_pool_l: jax.Array,
                   k_new: jax.Array, v_new: jax.Array,
                   page: jax.Array, slot: jax.Array
                   ) -> Tuple[jax.Array, jax.Array]:
    """Scatter new K/V rows into one layer's pool.

    k_pool_l/v_pool_l: (NH, P, ps, HS); k_new/v_new: (N, NH, HS) with
    coordinate vectors page/slot: (N,). Rows whose page is out of range are
    dropped (the invalid-token convention of token_coords)."""
    k_rows = k_new.transpose(1, 0, 2).astype(k_pool_l.dtype)  # (NH, N, HS)
    v_rows = v_new.transpose(1, 0, 2).astype(v_pool_l.dtype)
    k_pool_l = k_pool_l.at[:, page, slot].set(k_rows, mode="drop")
    v_pool_l = v_pool_l.at[:, page, slot].set(v_rows, mode="drop")
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
    NH, P, ps, HS = k_pool_l.shape
    k = jnp.take(k_pool_l, block_tables, axis=1)   # (NH, B, pages, ps, HS)
    v = jnp.take(v_pool_l, block_tables, axis=1)
    k = k.transpose(1, 0, 2, 3, 4).reshape(B, NH, pages_per_seq * ps, HS)
    v = v.transpose(1, 0, 2, 3, 4).reshape(B, NH, pages_per_seq * ps, HS)
    return k, v
