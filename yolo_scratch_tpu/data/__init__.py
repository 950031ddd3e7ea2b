from yolo_scratch_tpu.data.batch import (  # noqa: F401
    pad_targets,
    flat_to_padded,
    padded_to_flat,
)
from yolo_scratch_tpu.data.crater import CraterDataset  # noqa: F401
from yolo_scratch_tpu.data.coco import CocoDataset  # noqa: F401
from yolo_scratch_tpu.data.synthetic import SyntheticDataset  # noqa: F401
from yolo_scratch_tpu.data.loader import Loader  # noqa: F401
