from transparent_object_detection_tpu.ops.geometry import (  # noqa: F401
    bbox2dist,
    bbox_iou,
    dist2bbox,
    make_anchors,
    pairwise_iou,
    xywh2xyxy,
    xyxy2xywh,
)
from transparent_object_detection_tpu.ops.nms import batched_nms  # noqa: F401
from transparent_object_detection_tpu.ops.preprocess import (  # noqa: F401
    letterbox_batch,
    unletterbox_boxes,
)
