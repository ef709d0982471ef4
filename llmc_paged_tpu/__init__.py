"""llmc_paged_tpu — a TPU-native paged-attention GPT-2 inference engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``mx60s/llm.c-paged`` (reference at /root/reference): GPT-2 decode with
no-cache, contiguous-KV, and paged-KV paths; a block-table KV-cache manager
with LRU eviction (block_manager.c semantics); a single Pallas
paged-attention kernel; continuous batching; weight-only INT8 and INT8 KV
pages; and tensor sharding over heads via jax.sharding meshes.

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):
  L0 formats.py / tokenizer.py      — .bin artifact readers/writers
  L1 ops/                           — jnp + Pallas kernels
  L2 models/                        — params pytree + pure jitted forwards
  L3 kv/                            — page pool layouts + block manager
  L4 engine/                        — generate loops, continuous batching
  L5 parallel/                      — mesh, shardings, multi-host
"""

__version__ = "0.1.0"

from llmc_paged_tpu.config import GPT2Config  # noqa: F401
