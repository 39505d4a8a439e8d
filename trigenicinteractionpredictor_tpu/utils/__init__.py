from trigenicinteractionpredictor_tpu.utils.logging import JsonlLogger, get_logger  # noqa: F401
