from transparent_object_detection_tpu.utils.common import (  # noqa: F401
    get_classes,
    preprocess_input,
    seed_everything,
    show_config,
)
from transparent_object_detection_tpu.utils.image import (  # noqa: F401
    cvt_color,
    image_to_array,
    letterbox_params,
    resize_image,
)
