from llmc_paged_tpu.engine.engine import InferenceEngine, Request  # noqa: F401
from llmc_paged_tpu.engine.server import ServingEngine  # noqa: F401
