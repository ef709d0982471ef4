"""Decode-step time breakdown on the real chip (dev tool).

Answers "where does the per-token time go" for the flagship paged decode
(bench.py config): weight-streaming GEMVs vs the paged-attention kernel vs
the logits projection, across param dtypes. The reference's analogue is the
dev/cuda per-kernel benchmark harness (dev/cuda/README.md:1-3).

Run:  python -m llmc_paged_tpu.ops.dev.probe_decode [--model 124m]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.monotonic() - t0) / iters


def gemv_suite(B: int, cfg):
    """Per-matmul time and achieved HBM bandwidth for the decode shapes."""
    from llmc_paged_tpu.ops import layers as L

    C = cfg.channels
    shapes = {
        "qkv (3C,C)": (3 * C, C),
        "attproj (C,C)": (C, C),
        "fc (4C,C)": (4 * C, C),
        "fcproj (C,4C)": (C, 4 * C),
        "logits (Vp,C)": (cfg.padded_vocab_size, C),
    }
    rng = np.random.default_rng(0)
    print(f"-- GEMV suite, B={B} --")
    for name, (OC, IC) in shapes.items():
        for dtype, prec in [(jnp.float32, jax.lax.Precision.HIGHEST),
                            (jnp.float32, jax.lax.Precision.DEFAULT),
                            (jnp.bfloat16, jax.lax.Precision.DEFAULT)]:
            x = jnp.asarray(rng.normal(size=(B, IC)), dtype)
            w = jnp.asarray(rng.normal(size=(OC, IC)), dtype)
            f = jax.jit(functools.partial(L.linear, precision=prec))
            dt = timeit(f, x, w)
            gb = OC * IC * np.dtype(dtype.dtype if hasattr(dtype, "dtype")
                                    else dtype).itemsize / 1e9
            print(f"  {name:18s} {np.dtype(dtype).name:9s} "
                  f"{str(prec).split('.')[-1]:8s} {dt*1e6:9.1f} us  "
                  f"{gb/dt:7.1f} GB/s")


def kernel_suite(B: int, cfg, page_size=32, pages_per_seq=10):
    from llmc_paged_tpu.ops.paged_attention import paged_decode_attention

    NH, HS = cfg.num_heads, cfg.head_dim
    P = B * pages_per_seq + 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, NH, HS)), jnp.float32)
    kp = jnp.asarray(rng.normal(size=(NH, P, page_size, HS)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(NH, P, page_size, HS)), jnp.float32)
    tables = jnp.asarray(
        rng.permutation(P)[: B * pages_per_seq].reshape(B, pages_per_seq),
        jnp.int32)
    lengths = jnp.full((B,), page_size * pages_per_seq, jnp.int32)
    starts = jnp.zeros((B,), jnp.int32)
    dt = timeit(paged_decode_attention, q, kp, vp, tables, lengths, starts)
    bytes_moved = 2 * B * pages_per_seq * page_size * NH * HS * 4
    print(f"-- paged attention kernel: B={B} pages/seq={pages_per_seq} "
          f"ps={page_size}: {dt*1e6:.1f} us/layer-call, "
          f"{bytes_moved/dt/1e9:.1f} GB/s --")


def chunk_suite(B: int, cfg, dtypes=("float32", "bfloat16")):
    """Per-step time of the real chunked decode, by param/pool dtype."""
    import __graft_entry__ as _  # noqa: F401  (repo root on path)
    from llmc_paged_tpu.config import PageConfig
    from llmc_paged_tpu.kv.layouts import init_pool
    from llmc_paged_tpu.kv.manager import BlockManager
    from llmc_paged_tpu.models import gpt2
    from llmc_paged_tpu.models.gpt2_paged import decode_chunk_paged

    CHUNK = 32
    page_cfg = PageConfig(page_size=32, num_pages=B * 12 + 8, max_seqs=B,
                          pages_per_seq=12)
    params_np = jax.tree.map(
        np.asarray, gpt2.init_params(cfg, jax.random.PRNGKey(0)))
    for dtype_name in dtypes:
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]
        params = gpt2.to_device(params_np, cfg, dtype)
        pool = init_pool(cfg, page_cfg, dtype=dtype)
        mgr = BlockManager(page_cfg.num_pages, page_cfg.page_size, B)
        prompt = 128
        pgs = np.zeros((CHUNK, B), np.int32)
        sls = np.zeros((CHUNK, B), np.int32)
        for b in range(B):
            mgr.append_tokens(b, prompt)
            segs, _ = mgr.append_tokens(b, CHUNK)
            coords = [(s.page, s.offset + i) for s in segs
                      for i in range(s.count)]
            for j, (pj, sj) in enumerate(coords):
                pgs[j, b], sls[j, b] = pj, sj
        tables = np.stack([mgr.block_table_array(b, page_cfg.pages_per_seq)
                           for b in range(B)])
        first = np.zeros(B, np.int32)
        pos0 = np.full(B, prompt, np.int32)

        def run(pool):
            out, pool = decode_chunk_paged(
                params, jnp.asarray(first), jnp.asarray(pos0),
                jnp.asarray(pgs), jnp.asarray(sls), jnp.asarray(tables),
                pool, cfg, num_steps=CHUNK, window=cfg.max_seq_len)
            return out, pool

        # pool is donated: rebuild per timing pass
        out, pool = run(pool)          # compile
        jax.block_until_ready(out)
        iters = 8
        t0 = time.monotonic()
        for _ in range(iters):
            out, pool = run(pool)
        jax.block_until_ready(out)
        dt = (time.monotonic() - t0) / iters / CHUNK
        print(f"-- decode_chunk {dtype_name}: {dt*1e3:.3f} ms/step "
              f"({B/dt:.0f} tok/s at B={B}) --")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="124m",
                    choices=["124m", "350m", "774m", "1558m"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--skip", default="",
                    help="comma list: gemv,kernel,chunk")
    args = ap.parse_args()
    from llmc_paged_tpu.config import GPT2Config
    cfg = getattr(GPT2Config, f"gpt2_{args.model}")()
    skip = set(args.skip.split(","))
    print(f"device: {jax.devices()[0]}  model: {args.model}")
    if "gemv" not in skip:
        gemv_suite(args.batch, cfg)
    if "kernel" not in skip:
        kernel_suite(args.batch, cfg)
    if "chunk" not in skip:
        chunk_suite(args.batch, cfg)


if __name__ == "__main__":
    main()
