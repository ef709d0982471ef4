"""Generate golden parity fixtures with torch-CPU as the independent oracle.

Plays the role train_gpt2.py plays in the reference (write_model /
write_state / write_tokenizer, train_gpt2.py:300-367) — but offline: there
is no network in this environment, so instead of HuggingFace GPT-2 weights
we use a fixed-seed random-initialised GPT-2. Parity testing is equally
strong with random weights; what matters is that torch and the JAX engine
compute the same function.

Outputs (into --out, default tests/fixtures/):
  model_<tag>.bin          fp32 checkpoint (magic 20240326 v1)
  model_<tag>_bf16.bin     bf16 checkpoint (v2)
  state_<tag>.bin          debug state: x, y, logits, loss, grads (20240327)
  tokenizer_<tag>.bin      byte-fallback tokenizer (20240328)
  tokens_<tag>.bin         raw int32 token stream
  losses_<tag>.json        10-step AdamW loss trajectory (test_gpt2.c:145-156
                           pattern) + greedy/sampled decode token goldens

Run: python tools/make_golden.py [--tag tiny] [--full-124m]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from llmc_paged_tpu import formats  # noqa: E402
from llmc_paged_tpu.config import GPT2Config  # noqa: E402
from llmc_paged_tpu.tokenizer import byte_fallback_table  # noqa: E402


class TorchBlock(nn.Module):
    def __init__(self, cfg: GPT2Config):
        super().__init__()
        C, NH = cfg.channels, cfg.num_heads
        self.ln_1 = nn.LayerNorm(C, eps=1e-5)
        self.c_attn = nn.Linear(C, 3 * C)
        self.attn_proj = nn.Linear(C, C)
        self.ln_2 = nn.LayerNorm(C, eps=1e-5)
        self.c_fc = nn.Linear(C, 4 * C)
        self.c_proj = nn.Linear(4 * C, C)
        self.n_head = NH

    def forward(self, x):
        B, T, C = x.shape
        h = self.ln_1(x)
        qkv = self.c_attn(h)
        q, k, v = qkv.split(C, dim=2)
        hs = C // self.n_head
        q = q.view(B, T, self.n_head, hs).transpose(1, 2)
        k = k.view(B, T, self.n_head, hs).transpose(1, 2)
        v = v.view(B, T, self.n_head, hs).transpose(1, 2)
        att = (q @ k.transpose(-2, -1)) / math.sqrt(hs)
        mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
        att = att.masked_fill(~mask, float("-inf"))
        att = F.softmax(att, dim=-1)
        y = (att @ v).transpose(1, 2).contiguous().view(B, T, C)
        x = x + self.attn_proj(y)
        h2 = self.ln_2(x)
        h2 = self.c_proj(F.gelu(self.c_fc(h2), approximate="tanh"))
        return x + h2


class TorchGPT2(nn.Module):
    def __init__(self, cfg: GPT2Config):
        super().__init__()
        self.cfg = cfg
        self.wte = nn.Embedding(cfg.vocab_size, cfg.channels)
        self.wpe = nn.Embedding(cfg.max_seq_len, cfg.channels)
        self.blocks = nn.ModuleList(TorchBlock(cfg) for _ in range(cfg.num_layers))
        self.ln_f = nn.LayerNorm(cfg.channels, eps=1e-5)

    def forward(self, idx, targets=None):
        B, T = idx.shape
        pos = torch.arange(T, dtype=torch.long)
        x = self.wte(idx) + self.wpe(pos)[None]
        for blk in self.blocks:
            x = blk(x)
        x = self.ln_f(x)
        logits = x @ self.wte.weight.t()  # weight tying (train_gpt2.c:792)
        loss = None
        if targets is not None:
            loss = F.cross_entropy(logits.reshape(-1, logits.size(-1)),
                                   targets.reshape(-1))
        return logits, loss


def init_weights(model: TorchGPT2, seed: int) -> None:
    g = torch.Generator().manual_seed(seed)
    for name, p in model.named_parameters():
        with torch.no_grad():
            if p.dim() >= 2:
                p.normal_(0.0, 0.02, generator=g)
            elif "weight" in name:  # layernorm gains
                p.fill_(1.0)
            else:
                p.zero_()


def params_to_stacked(model: TorchGPT2) -> dict:
    """torch named params → the stacked-numpy pytree of formats.PARAM_SPECS."""
    cfg = model.cfg

    def stack(getter):
        return np.stack([getter(b).detach().numpy().astype(np.float32)
                         for b in model.blocks])

    return {
        "wte": model.wte.weight.detach().numpy().astype(np.float32),
        "wpe": model.wpe.weight.detach().numpy().astype(np.float32),
        "ln1w": stack(lambda b: b.ln_1.weight),
        "ln1b": stack(lambda b: b.ln_1.bias),
        "qkvw": stack(lambda b: b.c_attn.weight),
        "qkvb": stack(lambda b: b.c_attn.bias),
        "attprojw": stack(lambda b: b.attn_proj.weight),
        "attprojb": stack(lambda b: b.attn_proj.bias),
        "ln2w": stack(lambda b: b.ln_2.weight),
        "ln2b": stack(lambda b: b.ln_2.bias),
        "fcw": stack(lambda b: b.c_fc.weight),
        "fcb": stack(lambda b: b.c_fc.bias),
        "fcprojw": stack(lambda b: b.c_proj.weight),
        "fcprojb": stack(lambda b: b.c_proj.bias),
        "lnfw": model.ln_f.weight.detach().numpy().astype(np.float32),
        "lnfb": model.ln_f.bias.detach().numpy().astype(np.float32),
    }


def grads_to_stacked(model: TorchGPT2) -> dict:
    saved = {}
    for name, p in model.named_parameters():
        saved[name] = p.grad.detach().numpy().astype(np.float32).copy()
    cfg = model.cfg
    L = cfg.num_layers

    def stack(fmt):
        return np.stack([saved[fmt.format(i)] for i in range(L)])

    g = {
        "wte": saved["wte.weight"], "wpe": saved["wpe.weight"],
        "ln1w": stack("blocks.{}.ln_1.weight"), "ln1b": stack("blocks.{}.ln_1.bias"),
        "qkvw": stack("blocks.{}.c_attn.weight"), "qkvb": stack("blocks.{}.c_attn.bias"),
        "attprojw": stack("blocks.{}.attn_proj.weight"),
        "attprojb": stack("blocks.{}.attn_proj.bias"),
        "ln2w": stack("blocks.{}.ln_2.weight"), "ln2b": stack("blocks.{}.ln_2.bias"),
        "fcw": stack("blocks.{}.c_fc.weight"), "fcb": stack("blocks.{}.c_fc.bias"),
        "fcprojw": stack("blocks.{}.c_proj.weight"),
        "fcprojb": stack("blocks.{}.c_proj.bias"),
        "lnfw": saved["ln_f.weight"], "lnfb": saved["ln_f.bias"],
    }
    return g


def greedy_decode(model: TorchGPT2, prompt: list, n_new: int) -> list:
    """Torch greedy decode golden: full recompute per step over a growing
    window capped at max_seq_len (the infer.c sliding-window semantics)."""
    toks = list(prompt)
    maxT = model.cfg.max_seq_len
    with torch.no_grad():
        for _ in range(n_new):
            window = toks[-maxT:]
            idx = torch.tensor([window], dtype=torch.long)
            logits, _ = model(idx)
            toks.append(int(torch.argmax(logits[0, -1]).item()))
    return toks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__),
                                                  "..", "tests", "fixtures"))
    ap.add_argument("--tag", default="tiny")
    ap.add_argument("--full-124m", action="store_true",
                    help="also emit a random-init 124M-shape checkpoint")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    if args.full_124m:
        cfg = GPT2Config.gpt2_124m()
        B, T = 4, 64
    else:
        cfg = GPT2Config.tiny(max_seq_len=64, vocab_size=256, num_layers=4,
                              num_heads=4, channels=64)
        B, T = 4, 32

    torch.manual_seed(args.seed)
    model = TorchGPT2(cfg)
    init_weights(model, args.seed)
    model = model.float()

    tag = args.tag
    p = lambda name: os.path.join(args.out, name)

    params = params_to_stacked(model)
    formats.write_checkpoint(p(f"model_{tag}.bin"), cfg, params, "float32")
    formats.write_checkpoint(p(f"model_{tag}_bf16.bin"), cfg, params, "bfloat16")

    # fixed batch for the debug state
    g = torch.Generator().manual_seed(args.seed + 1)
    x = torch.randint(0, cfg.vocab_size, (B, T), generator=g)
    y = torch.randint(0, cfg.vocab_size, (B, T), generator=g)
    logits, loss = model(x, y)
    model.zero_grad()
    loss.backward()
    formats.write_debug_state(p(f"state_{tag}.bin"),
                              x.numpy().astype(np.int32),
                              y.numpy().astype(np.int32),
                              logits.detach().numpy().astype(np.float32),
                              float(loss.item()), grads_to_stacked(model))

    # tokenizer + token stream
    formats.write_tokenizer_bin(p(f"tokenizer_{tag}.bin"),
                                byte_fallback_table(cfg.vocab_size))
    g2 = torch.Generator().manual_seed(args.seed + 2)
    stream = torch.randint(0, cfg.vocab_size, (4096,), generator=g2)
    formats.write_token_stream(p(f"tokens_{tag}.bin"),
                               stream.numpy().astype(np.int32))

    # 10-step AdamW trajectory on the fixed batch (gpt2_update semantics:
    # lr=1e-4 betas=(0.9,0.999) eps=1e-8 wd=0, train_gpt2.c:922-948)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=0.0)
    losses = []
    for _ in range(10):
        opt.zero_grad()
        _, l = model(x, y)
        l.backward()
        losses.append(float(l.item()))
        opt.step()

    # decode goldens on the pristine (pre-training) weights
    model2 = TorchGPT2(cfg)
    init_weights(model2, args.seed)
    prompt = [int(t) for t in stream[:8]]
    greedy = greedy_decode(model2, prompt, 16)

    with open(p(f"losses_{tag}.json"), "w") as f:
        json.dump({"losses": losses, "prompt": prompt,
                   "greedy_tokens": greedy,
                   "config": {"max_seq_len": cfg.max_seq_len,
                              "vocab_size": cfg.vocab_size,
                              "num_layers": cfg.num_layers,
                              "num_heads": cfg.num_heads,
                              "channels": cfg.channels},
                   "B": B, "T": T, "seed": args.seed}, f, indent=1)
    print(f"wrote fixtures for tag={tag} cfg={cfg} to {args.out}")


if __name__ == "__main__":
    main()
