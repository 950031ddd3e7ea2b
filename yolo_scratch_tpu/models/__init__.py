from yolo_scratch_tpu.models.builder import (  # noqa: F401
    YOLOModel,
    build_yolo11,
    parse_model_config,
)
