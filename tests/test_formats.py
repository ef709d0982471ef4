"""L0 format round-trip and golden-fixture consistency tests
(reference pattern: test_gpt2.c:39-66 header parsing + tensor reads)."""

import json
import os

import numpy as np
import pytest

from llmc_paged_tpu import formats
from llmc_paged_tpu.config import GPT2Config
from llmc_paged_tpu.tokenizer import Tokenizer, byte_fallback_table


def test_checkpoint_roundtrip(tmp_path):
    cfg = GPT2Config.tiny()
    rng = np.random.default_rng(0)
    shapes = formats.param_shapes(cfg)
    params = {k: rng.standard_normal(s, dtype=np.float32) for k, s in shapes.items()}
    path = str(tmp_path / "m.bin")
    formats.write_checkpoint(path, cfg, params, "float32")
    cfg2, params2 = formats.read_checkpoint(path)
    assert cfg2 == cfg
    for k in shapes:
        np.testing.assert_array_equal(params[k], params2[k])


def test_checkpoint_bf16_roundtrip(tmp_path):
    cfg = GPT2Config.tiny()
    rng = np.random.default_rng(1)
    shapes = formats.param_shapes(cfg)
    params = {k: rng.standard_normal(s, dtype=np.float32) for k, s in shapes.items()}
    path = str(tmp_path / "m_bf16.bin")
    formats.write_checkpoint(path, cfg, params, "bfloat16")
    cfg2, params2 = formats.read_checkpoint(path)
    assert cfg2 == cfg
    for k in formats.BF16_FP32_TAIL:  # layernorms stay exact fp32
        np.testing.assert_array_equal(params[k], params2[k])
    for k in formats.BF16_ORDER:  # matmul weights round-trip through bf16
        np.testing.assert_allclose(params[k], params2[k], rtol=1e-2, atol=1e-2)


def test_bf16_conversion_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x = rng.standard_normal((64, 64)).astype(np.float32) * 100
    ours = formats._f32_to_bf16_bytes(x)
    theirs = torch.from_numpy(x).to(torch.bfloat16).view(torch.int16).numpy().tobytes()
    assert ours == theirs


def test_debug_state_roundtrip(tmp_path):
    cfg = GPT2Config.tiny()
    rng = np.random.default_rng(3)
    B, T = 2, 8
    shapes = formats.param_shapes(cfg)
    x = rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32)
    y = rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32)
    logits = rng.standard_normal((B, T, cfg.vocab_size), dtype=np.float32)
    grads = {k: rng.standard_normal(s, dtype=np.float32) for k, s in shapes.items()}
    path = str(tmp_path / "s.bin")
    formats.write_debug_state(path, x, y, logits, 3.25, grads)
    state = formats.read_debug_state(path, cfg)
    np.testing.assert_array_equal(state["x"], x)
    np.testing.assert_array_equal(state["y"], y)
    np.testing.assert_array_equal(state["logits"], logits)
    assert state["loss"] == 3.25
    for k in shapes:
        np.testing.assert_array_equal(state["grads"][k], grads[k])


def test_tokenizer_roundtrip(tmp_path):
    table = byte_fallback_table(256) + [b"hello", b" world"]
    path = str(tmp_path / "tok.bin")
    formats.write_tokenizer_bin(path, table)
    tok = Tokenizer.from_file(path)
    assert tok.vocab_size == 258
    assert tok.decode(256) == b"hello"
    assert tok.decode_safe(257) == " world"
    assert tok.decode(9999) is None
    # non-printable single byte renders empty (safe_printf semantics)
    assert tok.decode_safe(0) == ""
    assert tok.decode_safe(ord("A")) == "A"


def test_token_stream_roundtrip(tmp_path):
    toks = np.arange(100, dtype=np.int32)
    path = str(tmp_path / "toks.bin")
    formats.write_token_stream(path, toks)
    np.testing.assert_array_equal(formats.read_token_stream(path), toks)


def test_golden_fixture_parses(fixtures_dir):
    cfg, params = formats.read_checkpoint(os.path.join(fixtures_dir, "model_tiny.bin"))
    with open(os.path.join(fixtures_dir, "losses_tiny.json")) as f:
        meta = json.load(f)
    assert cfg.num_layers == meta["config"]["num_layers"]
    state = formats.read_debug_state(os.path.join(fixtures_dir, "state_tiny.bin"), cfg)
    assert state["logits"].shape == (meta["B"], meta["T"], cfg.vocab_size)
    assert np.isfinite(state["loss"])
