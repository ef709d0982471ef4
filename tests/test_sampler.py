"""Bit-exact parity of the host sampler with the reference RNG
(random_u32/random_f32 train_gpt2.c:1041-1050, sample_mult :1052-1063).

The expected u32 stream is verified against an independent C oracle compiled
on the fly (tests/csrc oracle), so parity does not rest on hand-derived
constants.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from llmc_paged_tpu.sampler import Sampler, XorshiftRNG, sample_argmax, sample_mult

C_ORACLE = r"""
#include <stdio.h>
#include <stdlib.h>
unsigned int random_u32(unsigned long long *state) {
    *state ^= *state >> 12;
    *state ^= *state << 25;
    *state ^= *state >> 27;
    return (*state * 0x2545F4914F6CDD1Dull) >> 32;
}
int main(int argc, char **argv) {
    unsigned long long state = strtoull(argv[1], 0, 10);
    int n = atoi(argv[2]);
    for (int i = 0; i < n; i++) {
        unsigned int u = random_u32(&state);
        float f = (u >> 8) / 16777216.0f;
        printf("%u %.9g\n", u, f);
    }
    return 0;
}
"""


@pytest.fixture(scope="module")
def c_stream(tmp_path_factory):
    d = tmp_path_factory.mktemp("oracle")
    src, exe = d / "rng.c", d / "rng"
    src.write_text(C_ORACLE)
    try:
        subprocess.run(["gcc", "-O0", "-o", str(exe), str(src)], check=True)
    except (OSError, subprocess.CalledProcessError):
        pytest.skip("no C compiler")
    out = subprocess.run([str(exe), "1337", "64"], check=True,
                         capture_output=True, text=True).stdout
    rows = [line.split() for line in out.strip().splitlines()]
    return [(int(u), float(f)) for u, f in rows]


def test_xorshift_matches_c_oracle(c_stream):
    rng = XorshiftRNG(1337)
    for exp_u32, exp_f32 in c_stream:
        u = rng.random_u32()
        assert u == exp_u32
    rng2 = XorshiftRNG(1337)
    for exp_u32, exp_f32 in c_stream:
        f = rng2.random_f32()
        assert np.float32(f) == np.float32(exp_f32)


def test_sample_mult_cdf_walk():
    probs = np.array([0.1, 0.2, 0.3, 0.4], dtype=np.float32)
    assert sample_mult(probs, 0.05) == 0
    assert sample_mult(probs, 0.1) == 1      # coin < cdf is strict
    assert sample_mult(probs, 0.29999) == 1
    assert sample_mult(probs, 0.95) == 3
    assert sample_mult(probs, 1.5) == 3      # rounding fallback → n-1


def test_sample_mult_matches_scalar_walk():
    rng = np.random.default_rng(7)
    for _ in range(20):
        probs = rng.dirichlet(np.ones(50)).astype(np.float32)
        coin = float(rng.uniform())
        cdf = np.float32(0.0)
        expect = len(probs) - 1
        for i, p in enumerate(probs):
            cdf += p
            if np.float32(coin) < cdf:
                expect = i
                break
        assert sample_mult(probs, coin) == expect


def test_sampler_greedy():
    s = Sampler(seed=1337, greedy=True)
    probs = np.array([0.2, 0.5, 0.3], dtype=np.float32)
    assert s.sample(probs) == 1
    assert sample_argmax(probs) == 1


def test_sampler_stream_deterministic():
    a = Sampler(seed=1337)
    b = Sampler(seed=1337)
    probs = np.full(16, 1.0 / 16, dtype=np.float32)
    seq_a = [a.sample(probs) for _ in range(32)]
    seq_b = [b.sample(probs) for _ in range(32)]
    assert seq_a == seq_b


def test_topk_probs_matches_torch_transform():
    """topk_probs == the PyTorch reference's sampling transform
    (train_gpt2.py GPT.generate :197-222: /temperature, logits < kth → -inf,
    softmax), including keep-all-ties at the k-th value."""
    import torch

    from llmc_paged_tpu.sampler import topk_probs

    rng = np.random.default_rng(7)
    for k, temp in [(40, 1.0), (5, 0.8), (1, 1.0), (200, 2.5)]:
        logits = rng.normal(size=128).astype(np.float32)
        logits[3] = logits[17]  # force a tie
        t = torch.from_numpy(logits.copy()) / temp
        v, _ = torch.topk(t, min(k, t.shape[-1]))
        t[t < v[-1]] = -float("inf")
        expected = torch.softmax(t, dim=-1).numpy()
        got = topk_probs(logits, top_k=k, temperature=temp)
        np.testing.assert_allclose(got, expected, atol=1e-6)
        assert (got > 0).sum() >= min(k, 128)


def test_sampler_topk_restricts_support():
    from llmc_paged_tpu.sampler import topk_probs

    rng = np.random.default_rng(0)
    logits = rng.normal(size=1000).astype(np.float32)
    top5 = set(np.argsort(logits)[-5:].tolist())
    s = Sampler(seed=1337, top_k=5)
    assert s.transforms_logits
    picks = {s.sample_logits(logits) for _ in range(200)}
    assert picks <= top5
    # no-transform sampler equals the plain softmax CDF walk
    s0, s1 = Sampler(seed=42), Sampler(seed=42)
    probs = topk_probs(logits)  # plain softmax
    assert not s0.transforms_logits
    for _ in range(20):
        assert s0.sample(probs) == s1.sample_logits(logits)


def test_topk_shipped_prefix_bit_exact():
    """Device-side top-k shipping (engine._sample_rows_topk) must sample
    the SAME tokens as downloading full rows, including the xorshift
    stream, across many rows — plus the boundary-tie fallback."""
    import jax.numpy as jnp

    from llmc_paged_tpu.engine.engine import _sample_rows_topk

    rng = np.random.default_rng(0)
    V, N, k = 512, 24, 8
    logits = rng.normal(size=(N, V)).astype(np.float32) * 3.0
    # manufacture boundary ties on some rows: the k-th..(2k+16)-th values
    # all equal → the shipped prefix cannot prove the mask and must fall
    # back to the full row
    for i in (3, 17):
        order = np.argsort(logits[i])[::-1]
        logits[i, order[k - 1: 2 * k + 20]] = logits[i, order[k - 1]]

    s_fast = Sampler(seed=1337, top_k=k, temperature=0.8)
    fast = _sample_rows_topk(s_fast, jnp.asarray(logits), N)

    s_full = Sampler(seed=1337, top_k=k, temperature=0.8)
    full = [s_full.sample_logits(logits[i]) for i in range(N)]
    assert fast == full
    assert s_fast.rng.state == s_full.rng.state   # same coin count too


def test_reconstruct_topk_row_roundtrip():
    import jax

    from llmc_paged_tpu.sampler import reconstruct_topk_row

    rng = np.random.default_rng(1)
    row = rng.normal(size=64).astype(np.float32)
    vals, idx = jax.lax.top_k(row, 16)
    rec = reconstruct_topk_row(np.asarray(vals), np.asarray(idx), 64)
    keep = np.argsort(row)[::-1][:16]
    assert np.isneginf(np.delete(rec, keep)).all()
    np.testing.assert_array_equal(rec[keep], row[keep])
