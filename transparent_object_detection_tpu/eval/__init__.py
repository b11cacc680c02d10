from transparent_object_detection_tpu.eval.callbacks import (  # noqa: F401
    EvalCallback,
    LossHistory,
)
from transparent_object_detection_tpu.eval.coco_map import coco_eval  # noqa: F401
from transparent_object_detection_tpu.eval.voc_map import (  # noqa: F401
    get_map_from_dirs,
    log_average_miss_rate,
    voc_ap,
    voc_map,
)
