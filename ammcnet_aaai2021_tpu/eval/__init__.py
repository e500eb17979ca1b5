from .gt import GroundTruthLoader, ped2_builtin_gt
from .scoring import (
    RecordResult,
    evaluate,
    fuse_and_smooth,
    img_pred_fea_comm_auc,
    normalize_records,
    roc_auc,
)

__all__ = [
    "GroundTruthLoader",
    "ped2_builtin_gt",
    "RecordResult",
    "evaluate",
    "fuse_and_smooth",
    "img_pred_fea_comm_auc",
    "normalize_records",
    "roc_auc",
]
