from hairgs_tpu.evaluation.metrics import pct_matched_points, compute_metrics
from hairgs_tpu.evaluation.eval_data import (
    compute_eval_data_from_gaussian,
    compute_eval_data_from_hair,
    load_eval_data_from_gaussians,
    eval_data_loading_callbacks,
)
