from transparent_object_detection_tpu.train.assigner import (  # noqa: F401
    AssignResult,
    task_aligned_assign,
)
from transparent_object_detection_tpu.train.loss import (  # noqa: F401
    LossConfig,
    detection_loss,
)
