"""Host-side sampling with bit-exact parity to the reference RNG.

The reference samples on the host from the full-vocab softmax using an
xorshift64* generator (random_u32/random_f32, train_gpt2.c:1041-1050) and a
linear CDF walk (sample_mult, train_gpt2.c:1052-1063), seed 1337
(paged_infer.c:975). Generated token streams can therefore be compared
token-for-token against the C binaries given identical probabilities.

This must stay host-side Python (not jax.random): parity is defined by this
exact integer recurrence.
"""

from __future__ import annotations

import numpy as np

_MASK64 = (1 << 64) - 1


class XorshiftRNG:
    """xorshift64* — matches random_u32 (train_gpt2.c:1041-1047) exactly."""

    def __init__(self, seed: int = 1337):
        self.state = seed & _MASK64
        assert self.state != 0, "xorshift state must be nonzero"

    def random_u32(self) -> int:
        s = self.state
        s ^= s >> 12
        s ^= (s << 25) & _MASK64
        s ^= s >> 27
        self.state = s
        return ((s * 0x2545F4914F6CDD1D) & _MASK64) >> 32

    def random_f32(self) -> float:
        # (u32 >> 8) / 2^24, float32-rounded like the C expression
        return float(np.float32(self.random_u32() >> 8) / np.float32(16777216.0))


def sample_mult(probabilities: np.ndarray, coin: float) -> int:
    """CDF sampling with float32 accumulation order identical to
    sample_mult (train_gpt2.c:1052-1063)."""
    probs = np.asarray(probabilities, dtype=np.float32)
    cdf = np.cumsum(probs, dtype=np.float32)
    hits = cdf > np.float32(coin)
    if not hits.any():
        return probs.shape[0] - 1  # rounding-error fallback, as in C
    return int(np.argmax(hits))


def sample_argmax(probabilities: np.ndarray) -> int:
    """Greedy decode (cached_infer.c generate_tokens_from_logits :894-908
    takes the max-probability token)."""
    return int(np.argmax(probabilities))


class Sampler:
    """Per-engine sampler state. One shared RNG stream across the decode
    loop, exactly like the single `rng_state` local in the reference mains."""

    def __init__(self, seed: int = 1337, greedy: bool = False):
        self.rng = XorshiftRNG(seed)
        self.greedy = greedy

    def sample(self, probabilities: np.ndarray) -> int:
        if self.greedy:
            return sample_argmax(probabilities)
        coin = self.rng.random_f32()
        return sample_mult(probabilities, coin)
