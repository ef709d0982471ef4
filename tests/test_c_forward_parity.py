"""Direct C-forward parity oracle (north star: "fp32 logits exactly
matching the C reference").

Compiles the REFERENCE's own forward — train_scratch.c, the only variant
whose layer loop covers all L layers (train_scratch.c:733 `for l < L`;
ops at :25-452) — into a shared library at test time, loads our byte-
identical tiny checkpoint fixture through ITS loader
(gpt2_build_from_checkpoint, train_scratch.c:590), runs ITS gpt2_forward,
and compares logits + mean loss against our jitted forward. This closes
the C ↔ repo chain directly instead of transitively through the torch
oracle (tools/make_golden.py)."""

import ctypes
import hashlib
import os
import subprocess

import numpy as np
import pytest

import jax.numpy as jnp

from llmc_paged_tpu import formats
from llmc_paged_tpu.models import gpt2
from llmc_paged_tpu.ops import layers as L

REFERENCE = "/root/reference/train_scratch.c"

# The reference mount is UNTRUSTED retrieved content; compiling and
# executing it at test time would hand it arbitrary code execution if it
# changed underneath us. Pin the exact bytes this oracle was written
# against and skip (loudly) on any mismatch.
REFERENCE_SHA256 = \
    "398ef4000687e8f17f6cfdd607601706a5033a521da4f5a16a3bd327054f7259"

# Wrapper, not a copy: the reference source itself is #included from its
# read-only mount and compiled with -DTESTING (its own test hook,
# train_scratch.c:953) to drop main().
WRAPPER = r"""
#define TESTING 1
#include "train_scratch.c"

int run_forward(const char* ckpt, int B, int T, const int* inputs,
                const int* targets, float* logits_out, float* loss_out) {
    GPT2 model;
    gpt2_build_from_checkpoint(&model, (char*)ckpt);
    gpt2_forward(&model, (int*)inputs, (int*)targets, B, T);
    int V = model.config.vocab_size;
    memcpy(logits_out, model.acts.logits, (size_t)B * T * V * sizeof(float));
    if (loss_out) *loss_out = model.mean_loss;
    return V;
}
"""


@pytest.fixture(scope="module")
def ref_lib(tmp_path_factory):
    if not os.path.exists(REFERENCE):
        pytest.skip("reference sources not mounted")
    with open(REFERENCE, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    if digest != REFERENCE_SHA256:
        pytest.skip(f"reference train_scratch.c sha256 {digest} != pinned "
                    f"{REFERENCE_SHA256}; refusing to compile/execute "
                    "modified untrusted content")
    d = tmp_path_factory.mktemp("cfwd")
    src = d / "wrapper.c"
    src.write_text(WRAPPER)
    so = d / "libreffwd.so"
    try:
        subprocess.run(
            ["gcc", "-O2", "-fPIC", "-shared", "-fopenmp",
             "-I", os.path.dirname(REFERENCE),
             "-o", str(so), str(src), "-lm"],
            check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        pytest.skip("no C compiler / openmp")
    lib = ctypes.CDLL(str(so))
    lib.run_forward.restype = ctypes.c_int32
    lib.run_forward.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.POINTER(ctypes.c_float)]
    return lib


def test_c_forward_logits_and_loss_parity(ref_lib, fixtures_dir):
    """Reference-C logits/loss vs our fp32 forward on the SAME checkpoint
    bytes (the fixture is written in the reference's v1 format and read
    here by the reference's own loader)."""
    ckpt = os.path.join(fixtures_dir, "model_tiny.bin")
    cfg, params_np = formats.read_checkpoint(ckpt)
    stream = formats.read_token_stream(
        os.path.join(fixtures_dir, "tokens_tiny.bin"))
    B, T = 2, 12
    x = np.ascontiguousarray(stream[: B * T].reshape(B, T).astype(np.int32))
    y = np.ascontiguousarray(stream[1: B * T + 1].reshape(B, T)
                             .astype(np.int32))

    logits_c = np.zeros((B, T, cfg.vocab_size), np.float32)
    loss_c = ctypes.c_float()
    v = ref_lib.run_forward(ckpt.encode(), B, T, x, y,
                            logits_c.reshape(-1), ctypes.byref(loss_c))
    assert v == cfg.vocab_size

    params = gpt2.to_device(params_np, cfg)
    logits = np.asarray(gpt2.forward(params, jnp.asarray(x), cfg))
    # fp32, different summation order (C loop nests vs MXU HIGHEST dots)
    np.testing.assert_allclose(logits, logits_c, rtol=1e-4, atol=1e-4)

    loss = float(L.softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(y)))
    # 3e-5: the first on-chip run (r4) measured 1.53e-5 — TPU HIGHEST
    # matmul accumulation order vs the C loop, not a semantic gap (the
    # logits themselves match at 1e-4)
    assert abs(loss - loss_c.value) < 3e-5, (loss, loss_c.value)


def test_c_forward_greedy_tokens_match(ref_lib, fixtures_dir):
    """Greedy argmax over the C logits equals our greedy pick at every
    position — the token-level form of the parity contract."""
    ckpt = os.path.join(fixtures_dir, "model_tiny.bin")
    cfg, params_np = formats.read_checkpoint(ckpt)
    stream = formats.read_token_stream(
        os.path.join(fixtures_dir, "tokens_tiny.bin"))
    B, T = 1, 16
    x = np.ascontiguousarray(stream[: B * T].reshape(B, T).astype(np.int32))
    logits_c = np.zeros((B, T, cfg.vocab_size), np.float32)
    ref_lib.run_forward(ckpt.encode(), B, T, x,
                        np.zeros((B, T), np.int32), logits_c.reshape(-1),
                        None)
    params = gpt2.to_device(params_np, cfg)
    logits = np.asarray(gpt2.forward(params, jnp.asarray(x), cfg))
    np.testing.assert_array_equal(np.argmax(logits, -1),
                                  np.argmax(logits_c, -1))
