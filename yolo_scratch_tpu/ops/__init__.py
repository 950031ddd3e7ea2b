from yolo_scratch_tpu.ops.boxes import (  # noqa: F401
    bbox_iou,
    pairwise_iou,
    xywh2xyxy,
    xyxy2xywh,
    dist2bbox,
    bbox2dist,
)
from yolo_scratch_tpu.ops.anchors import make_anchors  # noqa: F401
from yolo_scratch_tpu.ops.nms import (  # noqa: F401
    batched_nms,
    batched_nms_tiled,
    gather_topk_detections,
    gather_topk_detections_batched,
    nms,
)
from yolo_scratch_tpu.ops.pallas_nms import (  # noqa: F401
    nms_pallas,
    nms_pallas_batched,
)
from yolo_scratch_tpu.ops.dga_nms import dga_nms_device, pairwise_dga  # noqa: F401
from yolo_scratch_tpu.ops.decode import (  # noqa: F401
    postprocess,
    postprocess_from_feats,
    select_rows,
)
