from nimble_tpu.index.build import KmerIndex, build_index  # noqa: F401
