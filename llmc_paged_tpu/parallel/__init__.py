from llmc_paged_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    prepare_tp_params,
    shard_pool,
    tp_pool_spec,
    make_tp_decode_step,
    make_tp_prefill,
    make_dp_train_step,
)
