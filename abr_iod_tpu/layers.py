"""Layer facade (reference: maskrcnn_benchmark/layers/__init__.py:23-46).

One import point for the op surface the reference's layers package
exposed — here all TPU-native (XLA/Pallas) implementations."""

from .ops.nms import nms_padded as nms
from .ops.roi_align import roi_align, roi_align_batched
from .ops.roi_align_pallas import roi_align_pallas, make_roi_align_fused
from .ops.roi_pool import roi_pool, roi_pool_batched
from .ops.losses import smooth_l1_loss, sigmoid_focal_loss
from .ops.deform_conv import deform_conv2d, deform_psroi_pool
from .models.resnet import DFConv, FrozenBatchNorm

__all__ = [
    "nms",
    "roi_align",
    "roi_align_batched",
    "roi_align_pallas",
    "make_roi_align_fused",
    "roi_pool",
    "roi_pool_batched",
    "smooth_l1_loss",
    "sigmoid_focal_loss",
    "deform_conv2d",
    "deform_psroi_pool",
    "DFConv",
    "FrozenBatchNorm",
]
