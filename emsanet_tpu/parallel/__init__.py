from emsanet_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    make_parallel_eval_step,
    make_parallel_train_step,
    replicate_state,
    shard_batch,
)
