from llmc_paged_tpu.ops.layers import (  # noqa: F401
    layernorm,
    gelu_tanh,
    linear,
    causal_attention,
    softmax_cross_entropy,
)
