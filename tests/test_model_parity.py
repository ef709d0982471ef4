"""Golden-file parity against the torch oracle + cached==dense equivalence.

Mirrors the reference's test strategy (SURVEY.md §4): test_gpt2.c checks
logits/loss/grads elementwise against the PyTorch debug state (tol 1e-2,
test_gpt2.c:90-134) and a 10-step AdamW loss trajectory (:145-156);
test_matmul.c checks cached attention == dense attention. We use tighter
tolerances than the reference's 1e-2 since both sides are fp32 CPU here.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmc_paged_tpu import formats
from llmc_paged_tpu.config import GPT2Config
from llmc_paged_tpu.models import gpt2


@pytest.fixture(scope="module")
def golden(fixtures_dir):
    cfg, params_np = formats.read_checkpoint(
        os.path.join(fixtures_dir, "model_tiny.bin"))
    state = formats.read_debug_state(
        os.path.join(fixtures_dir, "state_tiny.bin"), cfg)
    with open(os.path.join(fixtures_dir, "losses_tiny.json")) as f:
        meta = json.load(f)
    params = gpt2.to_device(params_np, cfg)
    return cfg, params, state, meta


def test_forward_logits_match_torch(golden):
    cfg, params, state, _ = golden
    logits = gpt2.forward(params, jnp.asarray(state["x"]), cfg)
    np.testing.assert_allclose(np.asarray(logits), state["logits"],
                               rtol=2e-4, atol=2e-4)


def test_loss_matches_torch(golden):
    cfg, params, state, _ = golden
    loss = gpt2.loss_fn(params, jnp.asarray(state["x"]),
                        jnp.asarray(state["y"]), cfg)
    assert abs(float(loss) - state["loss"]) < 1e-4


def test_grads_match_torch(golden):
    cfg, params, state, _ = golden
    _, grads = gpt2.grad_fn(params, jnp.asarray(state["x"]),
                            jnp.asarray(state["y"]), cfg)
    for name in formats.param_shapes(cfg):
        got = np.asarray(grads[name])
        if name == "wte":  # padded rows must carry zero grad
            assert np.all(got[cfg.vocab_size:] == 0.0)
            got = got[: cfg.vocab_size]
        np.testing.assert_allclose(got, state["grads"][name],
                                   rtol=5e-3, atol=1e-4, err_msg=name)


def test_prefill_decode_matches_forward(golden):
    """cached path == no-cache path on the same token stream
    (the end-to-end comparison the reference's tests are missing,
    SURVEY.md §4 'gaps to fix')."""
    cfg, params, state, _ = golden
    x = state["x"][:, :16]
    B, T = x.shape
    full = np.asarray(gpt2.forward(params, jnp.asarray(x), cfg))

    split = 9
    cache = gpt2.init_cache(cfg, B, cfg.max_seq_len)
    logits_pre, cache = gpt2.prefill(params, jnp.asarray(x[:, :split]),
                                     cache, cfg)
    np.testing.assert_allclose(np.asarray(logits_pre), full[:, :split],
                               rtol=1e-4, atol=1e-5)
    for t in range(split, T):
        toks = jnp.asarray(x[:, t])
        pos = jnp.full((B,), t, dtype=jnp.int32)
        logits_t, cache = gpt2.decode_step(params, toks, pos, cache, cfg)
        np.testing.assert_allclose(np.asarray(logits_t), full[:, t],
                                   rtol=1e-4, atol=1e-5)


def test_bf16_checkpoint_close(golden, fixtures_dir):
    cfg, params, state, _ = golden
    cfg2, params_bf = formats.read_checkpoint(
        os.path.join(fixtures_dir, "model_tiny_bf16.bin"))
    assert cfg2 == cfg
    logits = gpt2.forward(gpt2.to_device(params_bf, cfg),
                          jnp.asarray(state["x"]), cfg)
    np.testing.assert_allclose(np.asarray(logits), state["logits"],
                               rtol=0.15, atol=0.15)


def test_adamw_loss_trajectory_matches_torch(golden):
    """10 AdamW steps on the fixed batch track torch losses
    (test_gpt2.c:145-165 pattern; gpt2_update hyperparams
    train_gpt2.c:922-948)."""
    optax = pytest.importorskip("optax")
    cfg, params, state, meta = golden
    x, y = jnp.asarray(state["x"]), jnp.asarray(state["y"])
    tx = optax.adamw(1e-4, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = gpt2.grad_fn(params, x, y, cfg)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    for i, expected in enumerate(meta["losses"]):
        loss, params, opt_state = step(params, opt_state)
        assert abs(float(loss) - expected) < 2e-3, (i, float(loss), expected)


def test_greedy_decode_matches_torch(golden):
    cfg, params, _, meta = golden
    toks = list(meta["prompt"])
    expect = meta["greedy_tokens"]
    while len(toks) < len(expect):
        window = toks[-cfg.max_seq_len:]
        logits = gpt2.forward(params, jnp.asarray([window], dtype=jnp.int32), cfg)
        toks.append(int(jnp.argmax(logits[0, -1])))
    assert toks == expect


def test_full_124m_golden_parity(fixtures_dir):
    """REAL-shape golden parity (the reference's tests run at full 124M,
    test_gpt2.c:39-66 — tiny-shape CI can hide shape-dependent bugs like
    vocab-padding or head-tiling mistakes). Generate the fixtures once
    with `python tools/make_golden.py --tag full124m --full-124m`; the
    test auto-skips when they are absent (they are ~750MB, gitignored).
    Recorded on-chip runs live in docs/TPU_RUNS.md."""
    path = os.path.join(fixtures_dir, "model_full124m.bin")
    if not os.path.exists(path):
        pytest.skip("run tools/make_golden.py --tag full124m --full-124m")
    cfg, params_np = formats.read_checkpoint(path)
    assert (cfg.num_layers, cfg.channels) == (12, 768)
    state = formats.read_debug_state(
        os.path.join(fixtures_dir, "state_full124m.bin"), cfg)
    params = gpt2.to_device(params_np, cfg)
    logits = gpt2.forward(params, jnp.asarray(state["x"]), cfg)
    # reference tolerance at this scale is 1e-2 (test_gpt2.c:90-134);
    # fp32 HIGHEST matmuls let us hold 2e-3 even at C=768 depth-12
    np.testing.assert_allclose(np.asarray(logits), state["logits"],
                               rtol=2e-3, atol=2e-3)
    loss = gpt2.loss_fn(params, jnp.asarray(state["x"]),
                        jnp.asarray(state["y"]), cfg)
    assert abs(float(loss) - state["loss"]) < 1e-3


def test_init_params_shapes():
    cfg = GPT2Config.tiny()
    params = gpt2.init_params(cfg, jax.random.PRNGKey(0))
    shapes = formats.param_shapes(cfg)
    for k, s in shapes.items():
        assert params[k].shape == s
    loss = gpt2.loss_fn(params, jnp.zeros((2, 8), jnp.int32),
                        jnp.zeros((2, 8), jnp.int32), cfg)
    assert np.isfinite(float(loss))
