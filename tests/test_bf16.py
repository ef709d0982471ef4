"""bfloat16 serving-mode gates.

The reference itself ships bf16 checkpoints (write_model version 2,
train_gpt2.py:267-298); our engine serves them natively (param_dtype /
kv_dtype "bfloat16"). Gates mirror the INT8 suite: whole-model loss delta
vs fp32 ≤ 0.05, and the bf16 paged engine must emit tokens whose teacher-
forced fp32 loss stays within the same gate.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmc_paged_tpu import formats
from llmc_paged_tpu.config import EngineConfig, PageConfig
from llmc_paged_tpu.engine.engine import InferenceEngine
from llmc_paged_tpu.engine.scheduler import Request
from llmc_paged_tpu.models import gpt2


@pytest.fixture(scope="module")
def golden(fixtures_dir):
    cfg, params_np = formats.read_checkpoint(
        os.path.join(fixtures_dir, "model_tiny.bin"))
    state = formats.read_debug_state(
        os.path.join(fixtures_dir, "state_tiny.bin"), cfg)
    return cfg, params_np, state


def test_bf16_model_loss_gate(golden):
    cfg, params_np, state = golden
    x, y = jnp.asarray(state["x"]), jnp.asarray(state["y"])
    params_f = gpt2.to_device(params_np, cfg)
    params_h = gpt2.to_device(params_np, cfg, jnp.bfloat16)
    assert params_h["qkvw"].dtype == jnp.bfloat16
    loss_f = float(gpt2.loss_fn(params_f, x, y, cfg))
    loss_h = float(gpt2.loss_fn(params_h, x, y, cfg))
    assert abs(loss_h - loss_f) < 0.05, (loss_f, loss_h)


def test_bf16_engine_tokens_loss_gate(golden):
    """bf16 params + bf16 KV pages through the full paged engine (chunk
    chain included): generated continuations, teacher-forced under the fp32
    model, must score within 0.05 nats of the fp32 engine's continuations."""
    cfg, params_np, state = golden
    prompt = [int(t) for t in np.asarray(state["x"]).reshape(-1)[:8]]
    page_kw = dict(page_size=8, num_pages=32, max_seqs=4, pages_per_seq=8)
    outs = {}
    for dtype in ("float32", "bfloat16"):
        page = PageConfig(kv_dtype=dtype, **page_kw)
        econf = EngineConfig(cache_mode="paged", page=page, max_batch=1,
                             greedy=True, param_dtype=dtype, decode_chunk=8)
        eng = InferenceEngine(params_np, cfg, econf)
        outs[dtype] = eng.run([Request(rid=0, prompt=prompt,
                                       max_new_tokens=24)])[0].tokens

    params_f = gpt2.to_device(params_np, cfg)
    losses = {}
    for dtype, toks in outs.items():
        x = jnp.asarray([toks[:-1]], jnp.int32)
        y = jnp.asarray([toks[1:]], jnp.int32)
        losses[dtype] = float(gpt2.loss_fn(params_f, x, y, cfg))
    assert abs(losses["bfloat16"] - losses["float32"]) < 0.05, losses
