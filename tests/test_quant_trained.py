"""Serving-dtype quality gate on TRAINED weights over real text.

The random-init fixtures the other int8 gates use have no outlier
channels — per-row absmax quantization is trivially easy on them. This
suite trains the tiny byte-level config to convergence on real English
prose (the repo's own documentation, tokenized by tools/prepro_text.py's
offline byte encoder) and gates the INT8 and bf16 val losses against
fp32 on held-out text, the reference's quality anchor applied to weights
with real learned statistics (HF-trained eval: train_gpt2.py:455; val
loop semantics: train_gpt2.c:1185-1195).
"""

import glob
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmc_paged_tpu.config import GPT2Config
from llmc_paged_tpu.eval import evaluate
from llmc_paged_tpu.models import gpt2
from llmc_paged_tpu.ops.int8 import quantize_params
from llmc_paged_tpu.train import train
from llmc_paged_tpu.utils.dataloader import DataLoader

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("trained")
    corpus = tmp / "corpus.txt"
    # STABLE corpus only: SURVEY.md + docs/layernorm.md haven't changed
    # since round 1. Training on the whole docs tree made the gate drift
    # with every documentation commit (round 4: the corpus grew 72->112KB
    # and 300 fixed steps no longer reached the convergence threshold).
    docs = [os.path.join(REPO, "SURVEY.md"),
            os.path.join(REPO, "docs", "layernorm.md")]
    text = "\n\n".join(open(d, encoding="utf-8").read() for d in docs)
    corpus.write_text(text, encoding="utf-8")

    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "prepro_text.py"),
         str(corpus), "--encoder", "byte", "--val-tokens", "8192",
         "--out-prefix", str(tmp / "docs")],
        check=True, cwd=REPO)

    B, T = 8, 128
    train_loader = DataLoader(str(tmp / "docs_train.bin"), B, T)
    val_loader = DataLoader(str(tmp / "docs_val.bin"), B, T)
    cfg = GPT2Config.tiny(max_seq_len=T, vocab_size=257, num_layers=2,
                          num_heads=4, channels=128)
    params = gpt2.to_device(
        {k: np.asarray(v)
         for k, v in gpt2.init_params(cfg, jax.random.PRNGKey(7)).items()},
        cfg)
    loss0 = evaluate(cfg, params, val_loader, batches=4)
    params, losses = train(cfg, params, train_loader, val_loader=None,
                           steps=300, lr=1e-3, weight_decay=0.1,
                           sample_every=0, log=lambda *_: None)
    if evaluate(cfg, params, val_loader, batches=4) >= 3.2:
        # adaptive second leg: convergence speed depends on the corpus;
        # the gate needs LEARNED weights, not a fixed step count
        params, more = train(cfg, params, train_loader, val_loader=None,
                             steps=300, lr=1e-3, weight_decay=0.1,
                             sample_every=0, log=lambda *_: None)
        losses = losses + more
    return cfg, params, val_loader, loss0, losses


def test_training_converged(trained):
    """The gate is only meaningful on genuinely learned weights: byte-level
    val NLL must drop well below the random-init ~ln(257)."""
    cfg, params, val_loader, loss0, losses = trained
    final = evaluate(cfg, params, val_loader, batches=4)
    assert loss0 > 5.0, loss0                  # sanity: started near random
    assert final < 3.2, (loss0, final)         # learned real byte statistics
    assert losses[-1] < losses[0] * 0.6


def test_int8_val_loss_gate_on_trained_weights(trained):
    """fp32 vs int8 val loss on held-out text: |delta| <= 0.05 (the
    north-star perplexity gate, measured on trained weights)."""
    cfg, params, val_loader, _, _ = trained
    loss_f = evaluate(cfg, params, val_loader, batches=4)
    params_q = quantize_params(params)
    assert params_q["qkvw"].dtype == jnp.int8
    loss_q = evaluate(cfg, params_q, val_loader, batches=4)
    print(f"trained-weights val loss: fp32 {loss_f:.4f} "
          f"int8 {loss_q:.4f} delta {loss_q - loss_f:+.4f}")
    assert abs(loss_q - loss_f) <= 0.05, (loss_f, loss_q)


def test_bf16_val_loss_gate_on_trained_weights(trained):
    cfg, params, val_loader, _, _ = trained
    loss_f = evaluate(cfg, params, val_loader, batches=4)
    params_h = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if v.dtype == jnp.float32 else v, params)
    loss_h = evaluate(cfg, params_h, val_loader, batches=4)
    print(f"trained-weights val loss: fp32 {loss_f:.4f} "
          f"bf16 {loss_h:.4f} delta {loss_h - loss_f:+.4f}")
    assert abs(loss_h - loss_f) <= 0.05, (loss_f, loss_h)


def test_spec_decode_on_trained_weights(trained):
    """Speculative decoding measured where it's honest: a CONVERGED model
    generating from real English text (random-init models loop, inflating
    n-gram acceptance). The stream must equal plain greedy exactly, and
    byte-level prose must give prompt-lookup some acceptance > the
    1 token/step floor."""
    from llmc_paged_tpu.config import EngineConfig, PageConfig
    from llmc_paged_tpu.engine.engine import InferenceEngine
    from llmc_paged_tpu.engine.scheduler import Request

    cfg, params, val_loader, _, _ = trained
    stream = val_loader.tokens
    prompts = [stream[o: o + 64].tolist() for o in (0, 512, 2048, 4096)]
    page = PageConfig(page_size=8, num_pages=96, max_seqs=4,
                      pages_per_seq=16)

    def run(spec_k):
        econf = EngineConfig(cache_mode="paged", page=page, greedy=True,
                             max_batch=4, decode_chunk=4, spec_k=spec_k)
        eng = InferenceEngine(params, cfg, econf)
        done = eng.run([Request(rid=i, prompt=list(p), max_new_tokens=48)
                        for i, p in enumerate(prompts)])
        return {r.rid: r.tokens for r in done}, dict(eng.stats)

    base, _ = run(0)
    spec, stats = run(4)
    assert spec == base, "speculative stream diverged from greedy"
    print(f"trained-weights spec: {stats['spec_tok_per_step']} tok/step "
          f"over {stats['spec_steps']} verify steps")
    assert stats["spec_tok_per_step"] >= 1.0
