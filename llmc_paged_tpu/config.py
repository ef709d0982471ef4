"""Configuration dataclasses.

The reference has zero CLI flags — model shape comes from the checkpoint
header and page geometry is compile-time #defines (block_manager.c:4-6:
BLOCK_SIZE=32, MAX_BLOCKS=100, MAX_PROMPTS=100). Here both are first-class
configs, since the engine must switch between the five BASELINE.json
configurations at runtime.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    """Model shape, as carried by the checkpoint header
    (train_gpt2.c:555-561 GPT2Config{max_seq_len,vocab_size,num_layers,
    num_heads,channels})."""

    max_seq_len: int = 1024   # maxT — wpe rows
    vocab_size: int = 50257   # V
    num_layers: int = 12      # L
    num_heads: int = 12       # NH
    channels: int = 768       # C

    # TPU-side knob (not in the reference): wte rows are padded to this
    # multiple so the (C, V) logits projection tiles into large MXU/DMA
    # blocks (2048 → 51200 for GPT-2's 50257; padded rows are zero and
    # logits are sliced back to V).
    vocab_pad_multiple: int = 2048

    @property
    def head_dim(self) -> int:
        assert self.channels % self.num_heads == 0
        return self.channels // self.num_heads

    @property
    def padded_vocab_size(self) -> int:
        m = self.vocab_pad_multiple
        return ((self.vocab_size + m - 1) // m) * m

    @staticmethod
    def gpt2_124m() -> "GPT2Config":
        return GPT2Config(1024, 50257, 12, 12, 768)

    @staticmethod
    def gpt2_350m() -> "GPT2Config":
        return GPT2Config(1024, 50257, 24, 16, 1024)

    @staticmethod
    def gpt2_774m() -> "GPT2Config":
        return GPT2Config(1024, 50257, 36, 20, 1280)

    @staticmethod
    def gpt2_1558m() -> "GPT2Config":
        return GPT2Config(1024, 50257, 48, 25, 1600)

    @staticmethod
    def tiny(max_seq_len: int = 64, vocab_size: int = 256, num_layers: int = 2,
             num_heads: int = 4, channels: int = 32) -> "GPT2Config":
        """Small config for tests (reference tests use full 124M against
        goldens; our CI box has one CPU core, so parity tests run tiny)."""
        return GPT2Config(max_seq_len, vocab_size, num_layers, num_heads,
                          channels)


@dataclasses.dataclass(frozen=True)
class PageConfig:
    """KV page-pool geometry (block_manager.c:4-6 semantics, TPU-tiled).

    ``page_size`` is tokens per page (reference BLOCK_SIZE=32); ``num_pages``
    is the pool size (reference MAX_BLOCKS=100); ``max_seqs`` bounds
    concurrent sequences (reference MAX_PROMPTS=100). ``pages_per_seq`` caps
    a single sequence's block table (static shape for the kernel)."""

    page_size: int = 32
    num_pages: int = 128
    max_seqs: int = 8
    pages_per_seq: int = 32
    kv_dtype: str = "float32"   # "float32" | "bfloat16" | "int8"
    # Content-addressed prefix caching (beyond the reference): FULL prompt
    # pages are shared across sequences by refcount and kept as a
    # reclaimable cache after their owners finish, so a repeated prompt
    # prefix (system prompt, few-shot header) is prefilled ONCE — later
    # admissions adopt the cached pages and prefill only their suffix
    # against them (kv/manager.py PrefixCachingBlockManager +
    # models/gpt2_paged.py prefill_suffix_paged). Requires full-context
    # attention (no --window) and single-device serving (no mesh_shape).
    prefix_cache: bool = False

    @property
    def max_context(self) -> int:
        return self.page_size * self.pages_per_seq


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Top-level engine switches covering the five BASELINE configs."""

    cache_mode: str = "paged"          # "none" | "dense" | "paged"
    page: PageConfig = dataclasses.field(default_factory=PageConfig)
    param_dtype: str = "float32"       # "float32" | "bfloat16" | "int8"
    # Compute dtype of the non-quantized leaves for param_dtype="int8"
    # (float32 keeps int8 TP tokens bit-equal to single-device; bfloat16
    # is slightly faster). Ignored for float params (they set it).
    activation_dtype: str = "float32"
    # "bfloat16" keeps a SECOND, bf16 copy of the weights used only by
    # the paged PREFILL (single-device path). Decode is weight-bandwidth
    # bound and stays int8; prefill is MXU-compute bound, where streaming
    # int8 through the dequant-fused dot throttles the matmul (measured
    # as int8 TTFT > bf16 TTFT at 1.5B). Costs one extra bf16 param copy
    # in HBM. None = prefill with the serving params (the default; token
    # streams then match the TP engine bit-exactly).
    prefill_param_dtype: Optional[str] = None
    max_batch: int = 8
    max_new_tokens: int = 64
    temperature: float = 1.0
    top_k: Optional[int] = None
    greedy: bool = False
    # Sample on DEVICE inside decode chunks (jax.random.categorical with
    # the top_k/temperature transform) instead of the host parity sampler —
    # enables chunked decoding for non-greedy serving at the cost of the
    # bit-exact xorshift stream (which stays the default).
    device_sampling: bool = False
    decode_chunk: int = 16             # greedy tokens per device round trip
    # Speculative decoding (greedy-exact, device-side prompt lookup):
    # each decode-chunk step verifies spec_k tokens (the carried token +
    # spec_k-1 n-gram drafts) in one forward, accepting the longest prefix
    # that matches the greedy argmax — a step yields 1..spec_k tokens for
    # ~the same HBM traffic as 1. 0/1 = off. Requires greedy serving,
    # full-context attention (no --window), single-device (no mesh_shape).
    spec_k: int = 0
    spec_ngram: int = 3                # drafting n-gram length
    # Streaming delivery (run(on_tokens=...)): while a request marked
    # stream=True is running, decode chains materialize at least every
    # N links so watchers see tokens at a bounded interval. Each flush
    # costs one host sync (~60ms on a relay-tunneled chip), so the knob
    # trades inter-flush latency against decode throughput.
    stream_links: int = 4
    # Allow Request.logprobs: the logprobs chunk executable is a separate
    # jit variant, so the FIRST logprobs request after a cold start pays
    # its compile (minutes at 1.5B) while the shared serving loop stalls —
    # operators can disable the surface entirely (CLI --no-logprobs).
    serve_logprobs: bool = True
    # Default stop ids for requests that don't set their own
    # (Request.stop_tokens): generation ends after the first of these
    # appears (kept as the last token). () = run to max_new_tokens, the
    # reference's fixed-length behavior (paged_infer.c:1055).
    stop_tokens: tuple = ()
    seed: int = 1337                   # xorshift seed (paged_infer.c:975)
    mesh_shape: Optional[dict] = None  # e.g. {"data": 1, "model": 4}
    # Validate every device-bound index (block tables, page/slot coords,
    # lengths) on the host before dispatch. The TPU-idiomatic replacement
    # for the reference's printf probes (paged_infer.c:539-560 "segfault
    # here?"): out-of-range indices on TPU don't segfault, they clamp/drop
    # silently — this catches them at the source instead.
    debug_checks: bool = False
    # Structured per-iteration log: every N scheduler iterations emit one
    # line (step, running/waiting seqs, pages free, decode tokens, tok/s) —
    # the reference's per-step print_state dump (block_manager.c:25-36,
    # called at paged_infer.c:532,572) made machine-readable. 0 = off.
    log_every: int = 0
