"""Trainer + data-prep tests (train_gpt2.c main / prepro script roles)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from llmc_paged_tpu import formats
from llmc_paged_tpu.models import gpt2
from llmc_paged_tpu.train import train
from llmc_paged_tpu.utils.dataloader import DataLoader


def test_train_loop_matches_torch_trajectory(fixtures_dir, tmp_path):
    """The train() loop on the golden fixed batch reproduces the torch
    AdamW trajectory (test_gpt2.c:145-165 pattern, via the data loader)."""
    cfg, params_np = formats.read_checkpoint(
        os.path.join(fixtures_dir, "model_tiny.bin"))
    state = formats.read_debug_state(
        os.path.join(fixtures_dir, "state_tiny.bin"), cfg)
    with open(os.path.join(fixtures_dir, "losses_tiny.json")) as f:
        meta = json.load(f)
    B, T = state["x"].shape
    # a token stream that reproduces the exact (x, y) batch every step:
    # x = chunk[:-1], y = chunk[1:] must equal the golden batch, which is
    # only possible if y==shift(x); the golden batch is random, so instead
    # drive train() with a stream and verify losses decrease monotonically,
    # then check exact parity via the direct fixed-batch loop below.
    stream = np.concatenate([state["x"].ravel(), state["x"].ravel()[:1]])
    path = tmp_path / "stream.bin"
    formats.write_token_stream(str(path), stream.astype(np.int32))
    loader = DataLoader(str(path), B, T)
    params = gpt2.to_device(params_np, cfg)
    _, losses = train(cfg, params, loader, steps=5, val_every=0 or 10**9,
                      sample_every=0, log=lambda *a: None)
    assert losses[-1] < losses[0]

    # exact parity on the fixed batch (same data every step)
    import optax
    params = gpt2.to_device(params_np, cfg)
    tx = optax.adamw(1e-4, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0)
    opt_state = tx.init(params)
    x, y = jnp.asarray(state["x"]), jnp.asarray(state["y"])
    for i, expected in enumerate(meta["losses"][:5]):
        loss, grads = gpt2.grad_fn(params, x, y, cfg)
        assert abs(float(loss) - expected) < 2e-3, i
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)


def test_train_cli_scratch_and_save(tmp_path, fixtures_dir):
    """From-scratch training via the CLI, saving a reference-format
    checkpoint that round-trips through the loader."""
    env = {**os.environ, "LLMC_PLATFORM": "cpu",
           "PYTHONPATH": os.path.join(os.path.dirname(__file__), "..") +
           os.pathsep + os.environ.get("PYTHONPATH", "")}
    save = str(tmp_path / "trained.bin")
    out = subprocess.run(
        [sys.executable, "-m", "llmc_paged_tpu.train",
         "--train-data", os.path.join(fixtures_dir, "tokens_tiny.bin"),
         "--val-data", os.path.join(fixtures_dir, "tokens_tiny.bin"),
         "--steps", "3", "--batch", "2", "--seq-len", "16",
         "--layers", "2", "--heads", "2", "--channels", "32",
         "--vocab", "256", "--max-seq-len", "32",
         "--val-every", "2", "--sample-every", "0", "--save", save],
        capture_output=True, text=True, timeout=600, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "train loss" in out.stdout and "val loss" in out.stdout
    cfg2, params2 = formats.read_checkpoint(save)
    assert cfg2.num_layers == 2 and cfg2.vocab_size == 256
    assert params2["wte"].shape == (256, 32)


def test_prepro_text_byte_fallback(tmp_path):
    src = tmp_path / "corpus.txt"
    src.write_text("hello world\n\nsecond document here\n\nthird one")
    out = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "tools",
                      "prepro_text.py"),
         str(src), "--encoder", "byte", "--val-tokens", "8"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-1000:]
    prefix = str(tmp_path / "corpus")
    train_toks = formats.read_token_stream(prefix + "_train.bin")
    val_toks = formats.read_token_stream(prefix + "_val.bin")
    table = formats.read_tokenizer_bin(prefix + "_tokenizer.bin")
    assert len(val_toks) == 8
    assert val_toks[0] == 256  # EOT prefix
    assert len(table) == 257
    # decode round-trip of the first document
    text = b"".join(table[t] for t in val_toks[1:]).decode()
    assert text == "hello w"


def test_prepro_text_parallel_shards_match_serial(tmp_path):
    """--workers N (the tinystories ProcessPoolExecutor shard pattern,
    prepro_tinystories.py:104-108) must produce byte-identical streams."""
    src = tmp_path / "corpus.txt"
    docs = [f"document number {i} with some text" for i in range(11)]
    src.write_text("\n\n".join(docs))
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "prepro_text.py")

    def run(workers, prefix):
        out = subprocess.run(
            [sys.executable, tool, str(src), "--encoder", "byte",
             "--val-tokens", "8", "--workers", str(workers),
             "--out-prefix", str(tmp_path / prefix)],
            capture_output=True, text=True, timeout=120)
        assert out.returncode == 0, out.stderr[-1000:]
        return (formats.read_token_stream(str(tmp_path / prefix) + "_train.bin"),
                formats.read_token_stream(str(tmp_path / prefix) + "_val.bin"))

    t1, v1 = run(1, "serial")
    t3, v3 = run(3, "sharded")
    np.testing.assert_array_equal(t1, t3)
    np.testing.assert_array_equal(v1, v3)


def test_eval_cli_dtype_gate(fixtures_dir):
    """The eval entry point reports val loss per serving dtype; int8 and
    bf16 must sit within the 0.05 gate of fp32 (north-star check as a
    user-facing tool)."""
    import re

    tool_env = dict(os.environ, LLMC_PLATFORM="cpu")
    losses = {}
    for dtype in ("float32", "bfloat16", "int8"):
        out = subprocess.run(
            [sys.executable, "-m", "llmc_paged_tpu.eval",
             "--checkpoint", os.path.join(fixtures_dir, "model_tiny.bin"),
             "--data", os.path.join(fixtures_dir, "tokens_tiny.bin"),
             "--dtype", dtype, "--batch", "2", "--seq-len", "16",
             "--batches", "3"],
            capture_output=True, text=True, timeout=300, env=tool_env,
            cwd=os.path.join(os.path.dirname(__file__), ".."))
        assert out.returncode == 0, out.stderr[-1000:]
        m = re.search(r"val loss ([0-9.]+)", out.stdout)
        losses[dtype] = float(m.group(1))
    assert abs(losses["bfloat16"] - losses["float32"]) < 0.05, losses
    assert abs(losses["int8"] - losses["float32"]) < 0.05, losses
