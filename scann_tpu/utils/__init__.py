from scann_tpu.utils.profiling import Timer, trace  # noqa: F401
