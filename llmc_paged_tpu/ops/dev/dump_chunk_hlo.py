"""Dump + grep the compiled HLO of _decode_chunk_paged at the
long-context isolation shapes (dev tool, VERDICT r4 next-step #1).

The r5 fetch-synced isolation matrix showed step time scaling with POOL
SIZE at constant live range (~2us/page/step at 124M) — the r1 failure
class (whole-pool copies) re-emerging somewhere the kernel isolation
can't see. This tool compiles the chunk for the real backend at chosen
shapes and counts/sizes the `copy`/`dynamic-update-slice`/`fusion` ops
that touch pool-shaped buffers, split by whether they sit inside the
scan's while-loop body (per-STEP cost) or outside it (per-CHUNK cost).

Run: python -m llmc_paged_tpu.ops.dev.dump_chunk_hlo [--model 124m]
         [--prompt 128] [--pool-mult 4] [--dtypes int8] [--save PATH]
"""

from __future__ import annotations

import argparse
import re
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp


def build_args(model: str, prompt: int, pool_mult: int, dtype: str,
               B: int = 8, chunk: int = 32, page_size: int = 128):
    import __graft_entry__ as _  # noqa: F401  (repo root on path)
    from llmc_paged_tpu.config import GPT2Config, PageConfig
    from llmc_paged_tpu.kv.layouts import init_pool
    from llmc_paged_tpu.kv.manager import BlockManager
    from llmc_paged_tpu.models import gpt2
    from llmc_paged_tpu.ops.int8 import quantize_params

    cfg = {"124m": GPT2Config.gpt2_124m, "350m": GPT2Config.gpt2_350m,
           "774m": GPT2Config.gpt2_774m,
           "1558m": GPT2Config.gpt2_1558m}[model]()
    pps = max(2, -(-(prompt + chunk) // page_size))
    page_cfg = PageConfig(page_size=page_size,
                          num_pages=(B * pps + 8) * pool_mult,
                          max_seqs=B, pages_per_seq=pps)
    params_f32 = gpt2.init_params(cfg, jax.random.PRNGKey(0))
    if dtype == "int8":
        params = quantize_params(gpt2.to_device(params_f32, cfg,
                                                jnp.bfloat16))
    else:
        params = gpt2.to_device(params_f32, cfg,
                                {"float32": jnp.float32,
                                 "bfloat16": jnp.bfloat16}[dtype])
    pool = init_pool(cfg, page_cfg,
                     dtype={"float32": jnp.float32,
                            "bfloat16": jnp.bfloat16,
                            "int8": "int8"}[dtype])
    mgr = BlockManager(page_cfg.num_pages, page_cfg.page_size, B)
    pgs = np.zeros((chunk, B), np.int32)
    sls = np.zeros((chunk, B), np.int32)
    for b in range(B):
        mgr.append_tokens(b, prompt)
        segs, _ = mgr.append_tokens(b, chunk)
        coords = [(s.page, s.offset + i) for s in segs
                  for i in range(s.count)]
        for j, (pj, sj) in enumerate(coords):
            pgs[j, b], sls[j, b] = pj, sj
    tables = np.stack([mgr.block_table_array(b, page_cfg.pages_per_seq)
                       for b in range(B)])
    return (cfg, page_cfg, params, pool,
            jnp.zeros(B, jnp.int32), jnp.full(B, prompt, jnp.int32),
            jnp.asarray(pgs), jnp.asarray(sls), jnp.asarray(tables))


# `%name = type[dims]{layout...} opcode(` — optimized-HLO instruction line
_INSTR_RE = re.compile(
    r"=\s*(s8|u8|bf16|f16|f32|s32|u32|pred)\[([0-9,]*)\]\S*\s+([a-z\-]+)")
_COMP_RE = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*(?:\([^=]*\))?\s*->")


def analyze(txt: str, pool_pages: int, nh: int, hs: int, ps: int,
            itemsize: int) -> None:
    """Count ops whose OUTPUT is pool-sized, grouped by the computation
    they sit in (while-loop bodies = per-STEP cost; entry = per-CHUNK).
    Byte totals use the op's output dtype."""
    pool_elems = pool_pages * nh * hs * ps
    scale_elems = pool_pages * nh * ps
    unit = {"s8": 1, "u8": 1, "pred": 1, "bf16": 2, "f16": 2,
            "f32": 4, "s32": 4, "u32": 4}
    cur_comp = "?"
    counts: dict = defaultdict(lambda: defaultdict(int))
    bytes_moved: dict = defaultdict(lambda: defaultdict(int))
    for line in txt.splitlines():
        cm = _COMP_RE.match(line)
        if cm and "= " not in line.split("->")[0]:
            cur_comp = cm.group(1)
            continue
        m = _INSTR_RE.search(line)
        if not m or not m.group(2):
            continue
        elems = int(np.prod([int(d) for d in m.group(2).split(",")]))
        if elems not in (pool_elems, scale_elems):
            continue
        op = m.group(3)
        if op in ("parameter", "get-tuple-element", "tuple", "constant"):
            continue        # free plumbing, not data movement
        tag = "scale" if elems == scale_elems else "pool"
        counts[cur_comp][f"{op}:{tag}"] += 1
        bytes_moved[cur_comp][f"{op}:{tag}"] += elems * unit[m.group(1)]
    print(f"pool buffer elems={pool_elems} ({pool_elems*itemsize/1e6:.1f} "
          f"MB @ {itemsize}B), scale elems={scale_elems}")
    for where in sorted(counts):
        for op, n in sorted(counts[where].items()):
            print(f"  [{where[:40]:40s}] {op:28s} x{n:4d}  "
                  f"{bytes_moved[where][op]/1e6:9.1f} MB")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="124m")
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--pool-mult", type=int, default=4)
    ap.add_argument("--dtypes", default="int8")
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--no-kernel", action="store_true")
    ap.add_argument("--save", default="",
                    help="also write the full HLO text here")
    args = ap.parse_args()

    import os
    if os.environ.get("LLMC_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    for dtype in args.dtypes.split(","):
        (cfg, page_cfg, params, pool, first, pos0, pgs, sls,
         tables) = build_args(args.model, args.prompt, args.pool_mult,
                              dtype, B=args.batch, chunk=args.chunk)
        from llmc_paged_tpu.models import gpt2_paged as GP
        fn = GP._decode_chunk_paged
        lowered = fn.lower(params, first, pos0, pgs, sls, tables, pool,
                           cfg, num_steps=args.chunk,
                           window=cfg.max_seq_len,
                           use_kernel=not args.no_kernel)
        compiled = lowered.compile()
        txt = compiled.as_text()
        print(f"== {args.model} {dtype} prompt={args.prompt} "
              f"pool={page_cfg.num_pages}p chunk={args.chunk} "
              f"kernel={not args.no_kernel}: HLO {len(txt)/1e6:.1f} MB ==")
        if args.save:
            with open(args.save + f".{dtype}", "w") as f:
                f.write(txt)
        analyze(txt, page_cfg.num_pages, cfg.num_heads, cfg.head_dim,
                page_cfg.page_size, 1 if dtype == "int8" else
                (2 if dtype == "bfloat16" else 4))
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            if ca:
                print(f"  cost_analysis: flops={ca.get('flops', 0):.3e} "
                      f"bytes={ca.get('bytes accessed', 0):.3e}")
        except Exception as e:
            print(f"  cost_analysis unavailable: {type(e).__name__}")


if __name__ == "__main__":
    main()
