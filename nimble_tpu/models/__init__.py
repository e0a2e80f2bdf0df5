from nimble_tpu.models.aligner import DeviceAlignEngine  # noqa: F401
