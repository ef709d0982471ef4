from llmc_paged_tpu.models import gpt2  # noqa: F401
