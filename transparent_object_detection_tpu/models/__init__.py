from transparent_object_detection_tpu.models.backbone import Backbone  # noqa: F401
from transparent_object_detection_tpu.models.blocks import (  # noqa: F401
    C2f,
    CBAM,
    ConvBNAct,
    Bottleneck,
    SelfAttention,
    SPPF,
    TransformerEncoderBlock,
    dfl_expectation,
    fuse_conv_bn,
)
from transparent_object_detection_tpu.models.detector import (  # noqa: F401
    FocusModel,
    build_model,
    count_params,
    init_variables,
)
from transparent_object_detection_tpu.models.head import Head  # noqa: F401
from transparent_object_detection_tpu.models.neck import Neck  # noqa: F401
