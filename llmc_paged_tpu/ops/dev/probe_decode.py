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


def _sync(out) -> float:
    """REAL device sync: fetch one scalar derived from `out`. Measured r5:
    this relay's block_until_ready returns with programs still in flight
    (8 chained 8192^2 matmuls "done" in 0.4ms), so every timing path must
    end on a value round trip (~30-60ms through the tunnel)."""
    leaf = jax.tree.leaves(out)[0]
    return float(np.asarray(jax.device_get(leaf)).ravel()[0])


def _slope(run_chain, iters):
    """Per-call seconds via two chain lengths: cancels the constant
    per-pass cost (the fetch round trip) that would otherwise dominate
    short kernels. run_chain(n) must execute n chained calls + one sync."""
    lo = max(1, iters // 5)
    t_lo = run_chain(lo)
    t_hi = run_chain(iters)
    return max((t_hi - t_lo) / (iters - lo), 1e-9)


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)

    def chain(n):
        t0 = time.monotonic()
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        return time.monotonic() - t0

    return _slope(chain, iters)


def timeit_cycle(fn, arg_sets, iters=20, warmup=0):
    """Cycles over argument tuples AND chains every call on the previous
    output (a zero-valued scalar folded into the first float arg). This
    environment both memoizes repeated identical pure calls and OVERLAPS
    independent queued programs — unchained timing reads multi-TB/s.
    Dependency-chained timing with a value-fetch sync (see _sync) and
    slope-cancelled round trip (see _slope) is faithful."""
    n = len(arg_sets)

    @jax.jit
    def g(scalar, *args):
        a0 = args[0] + (scalar * jnp.float32(1e-30)).astype(args[0].dtype)
        out = fn(a0, *args[1:])
        first = out[0] if isinstance(out, (tuple, list)) else out
        return out, jnp.sum(first).astype(jnp.float32)

    s = jnp.float32(0)
    out, s = g(s, *arg_sets[0])      # compile
    for i in range(warmup):
        out, s = g(s, *arg_sets[i % n])
    _sync(s)
    idx = [0]

    def chain(k):
        nonlocal s
        t0 = time.monotonic()
        for _ in range(k):
            out, s = g(s, *arg_sets[idx[0] % n])
            idx[0] += 1
        _sync(s)
        return time.monotonic() - t0

    return _slope(chain, iters)


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
            # every call must be a UNIQUE (x, w) pair: the runtime
            # memoizes pure executions it has already seen
            xs = [jnp.asarray(rng.normal(size=(B, IC)), dtype)
                  for _ in range(24)]
            ws = [jnp.asarray(rng.normal(size=(OC, IC)), dtype)
                  for _ in range(3)]
            f = jax.jit(functools.partial(L.linear, precision=prec))
            dt = timeit_cycle(f, [(x, ws[i % 3])
                                  for i, x in enumerate(xs)], iters=20,
                              warmup=0)
            gb = OC * IC * np.dtype(dtype.dtype if hasattr(dtype, "dtype")
                                    else dtype).itemsize / 1e9
            print(f"  {name:18s} {np.dtype(dtype).name:9s} "
                  f"{str(prec).split('.')[-1]:8s} {dt*1e6:9.1f} us  "
                  f"{gb/dt:7.1f} GB/s")


def kernel_suite(B: int, cfg, page_size=32, pages_per_seq=10,
                 quant=False, live_pages=None, qdtype=None):
    """One paged-attention layer-call in isolation. The default shapes
    are the historical ps=32 grid-kernel row; serving-shape rows
    (ps=128/256, int8, partial live range) are emitted by kernel_serving
    below."""
    from llmc_paged_tpu.kv.layouts import quantize_pages
    from llmc_paged_tpu.ops.paged_attention import (
        paged_decode_attention, paged_decode_attention_quant)

    NH, HS = cfg.num_heads, cfg.head_dim
    P = B * pages_per_seq + 8
    rng = np.random.default_rng(0)
    pools = []
    for _ in range(3):
        k = jnp.asarray(rng.normal(size=(P, NH, HS, page_size)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(P, NH, HS, page_size)), jnp.float32)
        if quant:
            kq, ks = quantize_pages(k)
            vq, vs = quantize_pages(v)
            pools.append((kq, vq, ks, vs))
        else:
            pools.append((k, v))
    tables = jnp.asarray(
        rng.permutation(P)[: B * pages_per_seq].reshape(B, pages_per_seq),
        jnp.int32)
    live = pages_per_seq if live_pages is None else live_pages
    lengths = jnp.full((B,), page_size * live, jnp.int32)
    starts = jnp.zeros((B,), jnp.int32)
    qdt = qdtype or jnp.float32
    qs = [jnp.asarray(rng.normal(size=(B, NH, HS)), qdt)
          for _ in range(24)]
    base = paged_decode_attention_quant if quant else paged_decode_attention
    interp = jax.default_backend() != "tpu"
    fn = functools.partial(base, interpret=interp)
    dt = timeit_cycle(fn,
                      [(qi, *pools[i % 3], tables, lengths, starts)
                       for i, qi in enumerate(qs)],
                      iters=2 if interp else 20, warmup=0)
    itemsize = 1 if quant else 4
    bytes_moved = 2 * B * live * page_size * NH * (HS * itemsize
                                                   + (4 if quant else 0))
    print(f"-- paged attention kernel: B={B} pages/seq={pages_per_seq} "
          f"live={live} ps={page_size} {'int8' if quant else 'f32'}"
          f" q={np.dtype(qdt).name}: {dt*1e6:.1f} us/layer-call, "
          f"{bytes_moved/dt/1e9:.1f} GB/s --")


def kernel_serving(B: int, cfg, page_size=128, deep=False):
    """Serving-shape kernel isolation: the exact per-layer attention call
    of the bench decode chunk (ps=128 int8, 3-page tables with 2 live),
    plus a full-table row and a float row for comparison. deep=True adds
    the LONG-CONTEXT shape (9-page tables, 8 live — the bench long_ctx
    row's read pattern, where the engine measured ~2.5x off the modeled
    byte floor and the per-page loop depth is the open suspect)."""
    pps = max(2, -(-(128 + 128) // page_size) + 1)
    kernel_suite(B, cfg, page_size, pps, quant=True, live_pages=pps - 1)
    kernel_suite(B, cfg, page_size, pps, quant=True, live_pages=pps - 1,
                 qdtype=jnp.bfloat16)   # serving q dtype (bf16 fast path)
    kernel_suite(B, cfg, page_size, pps, quant=True)
    kernel_suite(B, cfg, page_size, pps, quant=False, live_pages=pps - 1)
    if deep:
        dpps = -(-(896 + 128) // page_size) + 1
        kernel_suite(B, cfg, page_size, dpps, quant=True,
                     live_pages=dpps - 1)
        kernel_suite(B, cfg, page_size, dpps, quant=True,
                     live_pages=dpps - 1, qdtype=jnp.bfloat16)
        kernel_suite(B, cfg, page_size, dpps, quant=False,
                     live_pages=dpps - 1)


def matmul_suite(B: int, cfg, dtypes=("bfloat16", "int8"), steps=32):
    """Weight-matmul-only decode emulation: the exact 4 per-layer matmul
    shapes and dtype dispatch of the real step (unrolled layers inside a
    lax.scan), with attention/pool/logits removed. Individual matmul
    calls cannot be timed on this relay (~0.7ms dispatch floor per
    program swamps the 40-80us of interest — see bench_int8_matmul), so
    the phenomenon is isolated INSIDE one big program instead."""
    from llmc_paged_tpu.models import gpt2
    from llmc_paged_tpu.ops import layers as OL

    Lc, C = cfg.num_layers, cfg.channels
    params_np = jax.tree.map(
        np.asarray, gpt2.init_params(cfg, jax.random.PRNGKey(0)))

    for dtype_name in dtypes:
        # "+head" suffix: include the lm_head projection per step (the
        # chunk's real per-step cost includes it; base suite omits it)
        base, head = ((dtype_name[:-5], True)
                      if dtype_name.endswith("+head")
                      else (dtype_name, False))
        if base.startswith("int8"):
            from llmc_paged_tpu.ops.int8 import quantize_params
            keys = ("qkvw", "attprojw", "fcw", "fcprojw")
            params = quantize_params(gpt2.to_device(params_np, cfg),
                                     keys=keys + (("wte",) if head
                                                  else ()))
        else:
            params = gpt2.to_device(
                params_np, cfg, {"float32": jnp.float32,
                                 "bfloat16": jnp.bfloat16}[base])
        dtype_name = base

        # "int8xla": skip the Pallas kernel; let XLA fuse the int8->bf16
        # convert into its own gemm operand streaming
        def lin(lp, wk, x, bk=None, _xla=dtype_name == "int8xla"):
            if _xla and lp[wk].dtype == jnp.int8:
                wq = lp[wk]
                if x.shape[-1] < wq.shape[1]:   # IC padded to 128-mult
                    x = jnp.pad(x, ((0, 0), (0, wq.shape[1] - x.shape[-1])))
                out = jax.lax.dot_general(
                    x.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
                    dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * lp[wk + "_scale"]
                return out[..., : lp[bk].shape[-1]] + lp[bk] if bk else out
            return gpt2._lin(lp, wk, x, bk)

        @jax.jit
        def run(params, x0):
            stack = gpt2._layer_stack(params)
            lps = [{k: w[i] for k, w in stack.items()} for i in range(Lc)]

            def step(x, _):
                for lp in lps:
                    h = OL.layernorm(x, lp["ln1w"], lp["ln1b"])
                    qkv = lin(lp, "qkvw", h, "qkvb")
                    x = x + lin(lp, "attprojw", qkv[..., :C], "attprojb")
                    h2 = OL.layernorm(x, lp["ln2w"], lp["ln2b"])
                    x = x + lin(
                        lp, "fcprojw",
                        OL.gelu_tanh(lin(lp, "fcw", h2, "fcb")), "fcprojb")
                if head:
                    # consume EVERY logit column (a slice would let XLA
                    # narrow the bf16 dot to the consumed columns while
                    # the int8 kernel is opaque — an unfair comparison)
                    logits = gpt2._logits(x, params, cfg)
                    x = x + (1e-9 * jnp.sum(logits, axis=-1,
                                            keepdims=True)).astype(x.dtype)
                return x, ()

            x, _ = jax.lax.scan(step, x0, None, length=steps)
            return x

        x0 = jnp.asarray(np.random.default_rng(0).normal(size=(B, C)),
                         jnp.float32)
        out = run(params, x0)
        _sync(out)

        def chain(n, out=out):
            t0 = time.monotonic()
            for _ in range(n):
                out = run(params, out)   # chained on the carry
            _sync(out)
            return time.monotonic() - t0

        dt = _slope(chain, 5) / steps
        wkeys = ("qkvw", "attprojw", "fcw", "fcprojw") + (
            ("wte",) if head else ())
        wbytes = sum(int(np.prod(params[k].shape))
                     * params[k].dtype.itemsize for k in wkeys)
        tag = dtype_name + ("+head" if head else "")
        print(f"-- matmuls-only {tag}: {dt*1e3:.3f} ms/step "
              f"({dt/Lc*1e6:.1f} us/layer, weights {wbytes/1e6:.0f} MB -> "
              f"{wbytes/dt/1e9:.0f} GB/s) --")


def attention_suite(B: int, cfg, dtypes=("bfloat16", "int8"), steps=32,
                    page_size=128, prompt=128):
    """KV-write + paged-attention-only decode emulation (the complement
    of matmul_suite): per layer, derive q/k/v from the carry by reshape,
    quantize+scatter into the pool, run the paged-attention kernel —
    no weight matmuls, no logits. Isolates the pool-dtype cost."""
    from llmc_paged_tpu.config import PageConfig
    from llmc_paged_tpu.kv.layouts import (init_pool, write_layer_kv,
                                           write_layer_kv_quant)
    from llmc_paged_tpu.kv.manager import BlockManager
    from llmc_paged_tpu.ops.paged_attention import (
        paged_decode_attention, paged_decode_attention_quant)

    Lc, C, NH, HS = (cfg.num_layers, cfg.channels, cfg.num_heads,
                     cfg.head_dim)
    CHUNK = steps
    pps = max(2, -(-(prompt + CHUNK) // page_size))
    page_cfg = PageConfig(page_size=page_size, num_pages=B * pps + 8,
                          max_seqs=B, pages_per_seq=pps)
    mgr = BlockManager(page_cfg.num_pages, page_cfg.page_size, B)
    pgs = np.zeros((CHUNK, B), np.int32)
    sls = np.zeros((CHUNK, B), np.int32)
    for b in range(B):
        mgr.append_tokens(b, prompt)
        segs, _ = mgr.append_tokens(b, CHUNK)
        coords = [(s.page, s.offset + i) for s in segs
                  for i in range(s.count)]
        for j, (pj, sj) in enumerate(coords):
            pgs[j, b], sls[j, b] = pj, sj
    tables = jnp.asarray(np.stack(
        [mgr.block_table_array(b, page_cfg.pages_per_seq)
         for b in range(B)]))
    pgs, sls = jnp.asarray(pgs), jnp.asarray(sls)

    for dtype_name in dtypes:
        # "-scatteronly" / "-attendonly" suffixes decompose the suite
        base, _, part = dtype_name.partition("-")
        # "-P2"/"-P4": same work over a 2x/4x larger pool — if the
        # combined step time scales with pool size, something is COPYING
        # whole pool buffers per layer
        pcfg = page_cfg
        if part in ("P2", "P4"):
            mult = {"P2": 2, "P4": 4}[part]
            pcfg = PageConfig(page_size=page_cfg.page_size,
                              num_pages=page_cfg.num_pages * mult,
                              max_seqs=page_cfg.max_seqs,
                              pages_per_seq=page_cfg.pages_per_seq)
        pool = init_pool(cfg, pcfg,
                        dtype={"float32": jnp.float32,
                               "bfloat16": jnp.bfloat16,
                               "int8": "int8"}[base])
        quant = base == "int8"
        do_write = part != "attendonly"
        do_attend = part != "scatteronly"
        # "-stale": write AND attend, but attend reads the PRE-write pool
        # slices — isolates the write->read dependency / buffer-copy cost
        stale = part == "stale"

        @functools.partial(jax.jit, donate_argnums=(1,))
        def run(x0, pool):
            def step(carry, xs):
                x, pool, j = carry
                page_j, slot_j = xs
                lengths = jnp.full((B,), prompt + 1, jnp.int32) + j
                starts = jnp.zeros((B,), jnp.int32)
                for i in range(Lc):
                    kv = x.reshape(B, NH, HS)
                    pool_l = pool.layer(i)
                    old_pool_l = pool_l
                    if do_write:
                        pool_l = (write_layer_kv_quant(pool_l, kv, kv,
                                                       page_j, slot_j)
                                  if quant else
                                  write_layer_kv(*pool_l, kv, kv,
                                                 page_j, slot_j))
                        pool = pool.with_layer(i, pool_l)
                    if stale:
                        pool_l = old_pool_l
                    if do_attend:
                        att = (paged_decode_attention_quant(
                                   kv, *pool_l, tables, lengths, starts)
                               if quant else
                               paged_decode_attention(
                                   kv, *pool_l, tables, lengths, starts))
                        x = x + 0.01 * att.reshape(B, C)
                    else:
                        x = x + 0.01 * pool_l[0][0, :, :, 0].reshape(
                            1, NH * HS)[:, :C]
                return (x, pool, j + 1), ()

            (x, pool, _), _ = jax.lax.scan(
                step, (x0, pool, jnp.int32(0)), (pgs, sls), length=steps)
            return x, pool

        x0 = jnp.asarray(np.random.default_rng(0).normal(size=(B, C)),
                         jnp.float32)
        x, pool = run(x0, pool)
        _sync(x)

        def chain(n):
            nonlocal x, pool
            t0 = time.monotonic()
            for _ in range(n):
                x, pool = run(x, pool)
            _sync(x)
            return time.monotonic() - t0

        dt = _slope(chain, 5) / steps
        print(f"-- attention+scatter-only {dtype_name}: {dt*1e3:.3f} "
              f"ms/step ({dt/Lc*1e6:.1f} us/layer) --")


def prefill_suite(B: int, cfg, dtypes=("bfloat16", "int8", "int8bf16"),
                  T=128):
    """Paged prefill (B, T) wall time by param dtype — the r2 open
    thread: 1.5B prefill ~0.14s is ~4x off the MXU roofline, suspected
    cause the int8 dequant-fused dot throttling the compute-bound
    matmuls (unlike bandwidth-bound decode where it wins). 'int8bf16' is
    the serving fix under test: int8 pool writes but BF16 weights (the
    engine's prefill_param_dtype copy)."""
    from llmc_paged_tpu.config import PageConfig
    from llmc_paged_tpu.kv.layouts import init_pool, token_coords
    from llmc_paged_tpu.kv.manager import BlockManager
    from llmc_paged_tpu.models import gpt2
    from llmc_paged_tpu.models.gpt2_paged import prefill_paged
    from llmc_paged_tpu.ops.int8 import quantize_params

    page_cfg = PageConfig(page_size=128, num_pages=B * 3 + 8, max_seqs=B,
                          pages_per_seq=3)
    mgr = BlockManager(page_cfg.num_pages, page_cfg.page_size, B)
    for b in range(B):
        mgr.append_tokens(b, T)
    tables = jnp.asarray(np.stack(
        [mgr.block_table_array(b, page_cfg.pages_per_seq)
         for b in range(B)]))
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    valid = jnp.ones((B, T), bool)
    pg, sl = token_coords(tables, pos, page_cfg.page_size, valid,
                          page_cfg.num_pages)
    last = jnp.full((B,), T - 1, jnp.int32)
    params32 = gpt2.init_params(cfg, jax.random.PRNGKey(0))
    # model FLOPs (qkv+attproj+mlp+lm_head last-pos) for the roofline line
    C, L_, Vp = cfg.channels, cfg.num_layers, cfg.padded_vocab_size
    flops = 2 * B * T * L_ * 12 * C * C + 2 * B * C * Vp
    print(f"-- prefill suite, B={B} T={T} --")
    for name in dtypes:
        dev = jax.tree.map(
            lambda v: v.astype(jnp.bfloat16)
            if name != "float32" and v.dtype == jnp.float32 else v,
            params32)
        if name == "int8":
            dev = quantize_params(dev)
        kv_dtype = "int8" if name.startswith("int8") else name
        pool = init_pool(cfg, page_cfg,
                         dtype={"float32": jnp.float32,
                                "bfloat16": jnp.bfloat16,
                                "int8": "int8"}[kv_dtype])

        @functools.partial(jax.jit, donate_argnums=(2,))
        def run(params, toks, pool):
            logits, pool = prefill_paged(params, toks, pg, sl, pool, cfg,
                                         last_pos=last)
            # chain the next call's tokens on this call's logits so the
            # relay cannot memoize or overlap iterations
            nxt = (toks + jnp.argmax(logits, -1)[:, None]) % cfg.vocab_size
            return nxt.astype(jnp.int32), pool

        rng = np.random.default_rng(0)
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)),
                           jnp.int32)
        toks, pool = run(dev, toks, pool)   # compile
        _sync(toks)

        def chain(n):
            nonlocal toks, pool
            t0 = time.monotonic()
            for _ in range(n):
                toks, pool = run(dev, toks, pool)
            _sync(toks)
            return time.monotonic() - t0

        dt = _slope(chain, 6)
        print(f"  prefill {name:9s} {dt*1e3:8.2f} ms  "
              f"{flops/dt/1e12:6.2f} TFLOP/s")


def chunk_suite(B: int, cfg, dtypes=("float32", "bfloat16", "int8"),
                page_size=128, prompt=128, pool_mult=1):
    """Per-step time of the real chunked decode, by param/pool dtype.

    ``prompt`` sets the committed context length (the bench long_ctx row
    is prompt=896 → 8-9 live pages/seq at ps=128); ``pool_mult``
    multiplies the pool page count at constant live range — if step time
    scales with it, something is copying whole pool buffers."""
    import __graft_entry__ as _  # noqa: F401  (repo root on path)
    from llmc_paged_tpu.config import PageConfig
    from llmc_paged_tpu.kv.layouts import init_pool
    from llmc_paged_tpu.kv.manager import BlockManager
    from llmc_paged_tpu.models import gpt2
    from llmc_paged_tpu.models.gpt2_paged import decode_chunk_paged

    CHUNK = 32
    pps = max(2, -(-(prompt + CHUNK) // page_size))
    page_cfg = PageConfig(page_size=page_size,
                          num_pages=(B * pps + 8) * pool_mult,
                          max_seqs=B, pages_per_seq=pps)
    # params stay ON DEVICE (dtype casts are device-side): pulling the
    # fp32 pytree to numpy costs ~500MB (124M) / ~6GB (1.5B) through the
    # relay tunnel per process — it timed out the round-5 isolation runs
    params_f32 = gpt2.init_params(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(params_f32)
    for dtype_name in dtypes:
        # "param" or "param:kv" — e.g. "int8:bfloat16" isolates the
        # weight-matmul cost from the KV quantize+scatter cost
        pd, _, kd = dtype_name.partition(":")
        # "-xlaattn" suffix on the param dtype: run the chunk with
        # use_kernel=False (XLA gather-attention parts instead of the
        # Pallas manual-DMA kernel)
        use_kernel = True
        if pd.endswith("-xlaattn"):
            pd, use_kernel = pd[: -len("-xlaattn")], False
        kd = kd or pd
        if pd == "int8":
            from llmc_paged_tpu.ops.int8 import quantize_params
            params = quantize_params(gpt2.to_device(params_f32, cfg))
        elif pd == "int8b":
            # int8 weights with BF16 activations (biases/LN/wpe bf16):
            # the int8 kernel multiplies in bf16 anyway, so this is the
            # numerically-consistent serving pairing
            from llmc_paged_tpu.ops.int8 import quantize_params
            params = quantize_params(
                gpt2.to_device(params_f32, cfg, jnp.bfloat16))
            kd = kd if ":" in dtype_name else "int8"
        else:
            params = gpt2.to_device(params_f32, cfg,
                                    {"float32": jnp.float32,
                                     "bfloat16": jnp.bfloat16}[pd])
        pool = init_pool(cfg, page_cfg,
                         dtype={"float32": jnp.float32,
                                "bfloat16": jnp.bfloat16,
                                "int8": "int8"}[kd])
        mgr = BlockManager(page_cfg.num_pages, page_cfg.page_size, B)
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

        def run(pool, first):
            out, pool = decode_chunk_paged(
                params, jnp.asarray(first), jnp.asarray(pos0),
                jnp.asarray(pgs), jnp.asarray(sls), jnp.asarray(tables),
                pool, cfg, num_steps=CHUNK, window=cfg.max_seq_len,
                use_kernel=use_kernel)
            return out, pool

        # The pool donation chain serializes calls, but the chunk is a
        # FIXED POINT of the pool (same coords, same values) — after call
        # 1 every call is bit-identical and the relay MEMOIZES it (r5
        # measured 0.026 ms/step). Distinct first_tokens per call keep
        # every chunk program execution unique; _sync/_slope because
        # block_until_ready never actually syncs on this relay.
        iters = 8
        rng_f = np.random.default_rng(3)
        firsts = rng_f.integers(0, cfg.vocab_size, (4 * iters, B)) \
            .astype(np.int32)
        out, pool = run(pool, firsts[-1])          # compile
        _sync(out)
        idx = [0]

        def chain(n):
            nonlocal out, pool
            t0 = time.monotonic()
            for _ in range(n):
                out, pool = run(pool, firsts[idx[0] % (4 * iters - 1)])
                idx[0] += 1
            _sync(out)
            return time.monotonic() - t0

        dt = _slope(chain, iters) / CHUNK
        print(f"-- decode_chunk {dtype_name} ps={page_size}: "
              f"{dt*1e3:.3f} ms/step ({B/dt:.0f} tok/s at B={B}) --",
              flush=True)


def chunk_suite_unrolled(B: int, cfg, dtypes=("float32", "bfloat16")):
    """Variant probe: pool as a TUPLE of per-layer buffers with an unrolled
    Python layer loop (static indices → XLA can update each layer buffer in
    place) instead of streaming stacked pool planes through lax.scan xs/ys.
    Measures whether the scan's read+write of every pool plane per step is
    worth eliminating at the cost of L-times compile."""
    import functools as ft

    import __graft_entry__ as _  # noqa: F401
    from llmc_paged_tpu.config import PageConfig
    from llmc_paged_tpu.kv.layouts import write_layer_kv
    from llmc_paged_tpu.kv.manager import BlockManager
    from llmc_paged_tpu.models import gpt2
    from llmc_paged_tpu.ops import layers as OL
    from llmc_paged_tpu.ops.paged_attention import paged_decode_attention

    CHUNK = 32
    page_cfg = PageConfig(page_size=128, num_pages=B * 3 + 8, max_seqs=B,
                          pages_per_seq=3)
    Lc = cfg.num_layers

    @ft.partial(jax.jit, static_argnames=("num_steps", "window"),
                donate_argnums=(2,))
    def chunk_unrolled(params, meta, pools, num_steps, window):
        first, pos0, pgs, sls, tables = meta
        lps = [{k: params[k][i] for k in gpt2.LAYER_KEYS} for i in range(Lc)]

        def step(carry, xs):
            toks, pools, j = carry
            page_j, slot_j = xs
            pos = pos0 + j
            lengths = pos + 1
            starts = jnp.maximum(0, pos + 1 - window)
            x = gpt2._embed(params, toks, jnp.minimum(pos, window - 1))
            pools = list(pools)
            for i in range(Lc):
                lp = lps[i]
                h = OL.layernorm(x, lp["ln1w"], lp["ln1b"])
                qkv = gpt2._lin(lp, "qkvw", h, "qkvb")
                q, k, v = gpt2._split_qkv(qkv, cfg)
                k_l, v_l = write_layer_kv(pools[2 * i], pools[2 * i + 1],
                                          k, v, page_j, slot_j)
                pools[2 * i], pools[2 * i + 1] = k_l, v_l
                att = paged_decode_attention(q, k_l, v_l, tables, lengths,
                                             starts)
                x = x + gpt2._lin(lp, "attprojw",
                                  att.reshape(x.shape[0], cfg.channels),
                                  "attprojb")
                h2 = OL.layernorm(x, lp["ln2w"], lp["ln2b"])
                x = x + gpt2._lin(
                    lp, "fcprojw",
                    OL.gelu_tanh(gpt2._lin(lp, "fcw", h2, "fcb")), "fcprojb")
            logits = gpt2._logits(x, params, cfg)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (nxt, tuple(pools), j + 1), nxt

        (_, pools, _), out = jax.lax.scan(
            step, (first, pools, jnp.int32(0)), (pgs, sls),
            length=num_steps)
        return out, pools

    params_np = jax.tree.map(
        np.asarray, gpt2.init_params(cfg, jax.random.PRNGKey(0)))
    for dtype_name in dtypes:
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]
        params = gpt2.to_device(params_np, cfg, dtype)
        shape = (page_cfg.num_pages, cfg.num_heads, cfg.head_dim,
                 page_cfg.page_size)
        pools = tuple(jnp.zeros(shape, dtype) for _ in range(2 * Lc))
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
        meta = (jnp.zeros(B, jnp.int32), jnp.full(B, prompt, jnp.int32),
                jnp.asarray(pgs), jnp.asarray(sls), jnp.asarray(tables))
        t0 = time.monotonic()
        out, pools = chunk_unrolled(params, meta, pools,
                                    num_steps=CHUNK, window=cfg.max_seq_len)
        _sync(out)
        compile_s = time.monotonic() - t0
        iters = 8
        rng_f = np.random.default_rng(5)
        firsts = rng_f.integers(0, cfg.vocab_size, (4 * iters, B)) \
            .astype(np.int32)
        idx = [0]

        def chain(n):
            nonlocal out, pools
            t0 = time.monotonic()
            for _ in range(n):
                m = (jnp.asarray(firsts[idx[0] % (4 * iters - 1)]),
                     *meta[1:])
                out, pools = chunk_unrolled(params, m, pools,
                                            num_steps=CHUNK,
                                            window=cfg.max_seq_len)
                idx[0] += 1
            _sync(out)
            return time.monotonic() - t0

        dt = _slope(chain, iters) / CHUNK
        print(f"-- decode_chunk UNROLLED {dtype_name}: {dt*1e3:.3f} ms/step "
              f"({B/dt:.0f} tok/s at B={B}; compile {compile_s:.1f}s) --")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="124m",
                    choices=["124m", "350m", "774m", "1558m"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--skip", default="",
                    help="comma list: gemv,kernel,kserve,kdeep,matmul,"
                         "prefill,attention,chunk,unrolled")
    ap.add_argument("--page-size", type=int, default=128,
                    help="pool page size for the kserve/attention/chunk "
                         "suites (tables resize to fit prompt+chunk)")
    ap.add_argument("--prompt", default="128",
                    help="committed context length for the attention/chunk "
                         "suites (896 = the bench long_ctx regime); comma "
                         "list sweeps cells in ONE process")
    ap.add_argument("--pool-mult", default="1",
                    help="chunk-suite pool page multiplier at constant "
                         "live range (pool-size-scaling probe); comma list "
                         "sweeps cells in ONE process")
    ap.add_argument("--dtypes", default="float32,bfloat16,int8",
                    help="comma list for the chunk suite")
    ap.add_argument("--attn-variants", default="",
                    help="comma list of serving-kernel variants to sweep "
                         "for the attention/chunk suites: 'flat' (default "
                         "ring depth), 'flatN' (ring depth N, e.g. flat2/"
                         "flat8), 'gridb'. Empty = current env settings.")
    args = ap.parse_args()
    import os as _os
    if _os.environ.get("LLMC_PLATFORM"):
        # CPU smoke runs (the axon plugin force-sets the TPU platform;
        # env JAX_PLATFORMS is ignored — engine/cli.py does the same)
        jax.config.update("jax_platforms", _os.environ["LLMC_PLATFORM"])

    from llmc_paged_tpu.config import GPT2Config
    from llmc_paged_tpu.utils import enable_compile_cache
    enable_compile_cache()
    cfg = getattr(GPT2Config, f"gpt2_{args.model}")()
    skip = set(args.skip.split(","))
    print(f"device: {jax.devices()[0]}  model: {args.model}")
    if "gemv" not in skip:
        gemv_suite(args.batch, cfg)
    if "kernel" not in skip:
        kernel_suite(args.batch, cfg)
    if "matmul" not in skip:
        matmul_suite(args.batch, cfg,
                     dtypes=tuple(d for d in args.dtypes.split(",")
                                  if ":" not in d))
    if "prefill" not in skip:
        prefill_suite(args.batch, cfg)

    variants = [v for v in args.attn_variants.split(",") if v]
    for variant in variants or [None]:
        if variant is not None:
            # _variant()/_flat_nbuf() are read at trace time but jit
            # caches ignore env vars — drop every cached trace so the
            # same-shape suite calls really retrace onto the new kernel
            jax.clear_caches()
            if variant.startswith("flat") and \
                    (not variant[4:] or variant[4:].isdigit()):
                _os.environ["LLMC_ATTN_VARIANT"] = "flat"
                if variant[4:]:
                    _os.environ["LLMC_ATTN_NBUF"] = variant[4:]
                else:
                    _os.environ.pop("LLMC_ATTN_NBUF", None)
            else:
                _os.environ["LLMC_ATTN_VARIANT"] = variant
            print(f"== attention variant: {variant} ==")
        if "kserve" not in skip:
            kernel_serving(args.batch, cfg, page_size=args.page_size,
                           deep="kdeep" not in skip)
        prompts = [int(p) for p in str(args.prompt).split(",")]
        pool_mults = [int(m) for m in str(args.pool_mult).split(",")]
        if "attention" not in skip:
            attention_suite(args.batch, cfg,
                            dtypes=tuple(d for d in args.dtypes.split(",")
                                         if ":" not in d
                                         and d != "int8xla"),
                            page_size=args.page_size, prompt=prompts[0])
        if "chunk" not in skip:
            for pr in prompts:
                for pm in pool_mults:
                    if len(prompts) > 1 or len(pool_mults) > 1:
                        print(f"== chunk cell prompt={pr} pool_mult={pm} ==",
                              flush=True)
                    try:
                        chunk_suite(args.batch, cfg,
                                    dtypes=tuple(args.dtypes.split(",")),
                                    page_size=args.page_size, prompt=pr,
                                    pool_mult=pm)
                    except Exception as e:   # relay flap: keep sweeping
                        print(f"!! chunk cell prompt={pr} pool_mult={pm} "
                              f"FAILED: {type(e).__name__}: {e}",
                              flush=True)
    if "unrolled" not in skip:
        chunk_suite_unrolled(args.batch, cfg)


if __name__ == "__main__":
    main()
