from .boxes import (
    area,
    pairwise_iou,
    clip_boxes,
    encode_deltas,
    apply_deltas,
    ltrb_to_xyxy,
    nonempty_mask,
)
from .instances import Detections, Proposals

__all__ = [
    "area",
    "pairwise_iou",
    "clip_boxes",
    "encode_deltas",
    "apply_deltas",
    "ltrb_to_xyxy",
    "nonempty_mask",
    "Detections",
    "Proposals",
]
