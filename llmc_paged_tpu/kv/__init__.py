from llmc_paged_tpu.kv.manager import BlockManager  # noqa: F401
from llmc_paged_tpu.kv.layouts import PagePool  # noqa: F401
