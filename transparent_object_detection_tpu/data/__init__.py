from transparent_object_detection_tpu.data.annotations import (  # noqa: F401
    coco_category_remap,
    coco_to_annotation_lines,
    parse_annotation_line,
    read_annotation_file,
    write_annotation_file,
)
from transparent_object_detection_tpu.data.dataset import (  # noqa: F401
    DetectionDataset,
    collate,
)
from transparent_object_detection_tpu.data.loader import (  # noqa: F401
    DataLoader,
    device_prefetch,
)
