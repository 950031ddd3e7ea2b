from yolo_scratch_tpu.losses.tal import task_aligned_assign  # noqa: F401
from yolo_scratch_tpu.losses.v8_loss import (  # noqa: F401
    DetectionLossConfig,
    v8_detection_loss,
)
