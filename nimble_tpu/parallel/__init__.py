from nimble_tpu.parallel.sharded import (  # noqa: F401
    ShardedIndex,
    build_sharded_index,
    make_sharded_step,
)
