from trigenicinteractionpredictor_tpu.train.trainer import FitResult, fit  # noqa: F401
from trigenicinteractionpredictor_tpu.train.checkpoint import (  # noqa: F401
    load_checkpoint,
    save_checkpoint,
    write_text_dump,
)
