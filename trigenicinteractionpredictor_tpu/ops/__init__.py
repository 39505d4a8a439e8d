from trigenicinteractionpredictor_tpu.ops.em import (  # noqa: F401
    Batch,
    em_step,
    em_sufficient_stats,
    log_likelihood,
    normalize_from_stats,
    pair_em_sufficient_stats,
)
from trigenicinteractionpredictor_tpu.ops.scoring import predict_proba  # noqa: F401
from trigenicinteractionpredictor_tpu.ops.metrics import auc, average_precision  # noqa: F401
