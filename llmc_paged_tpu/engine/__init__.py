from llmc_paged_tpu.engine.engine import InferenceEngine, Request  # noqa: F401
