from .roi_align import roi_align, roi_align_batched
from .nms import nms_padded
from .losses import smooth_l1_loss, sigmoid_focal_loss

__all__ = [
    "roi_align",
    "roi_align_batched",
    "nms_padded",
    "smooth_l1_loss",
    "sigmoid_focal_loss",
]
