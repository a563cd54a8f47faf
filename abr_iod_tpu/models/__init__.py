from .detector import FasterRCNN
from .resnet import ResNetC4, Res5Head, FrozenBatchNorm
from .rpn import RPNHead, flatten_rpn_outputs
from .box_head import RoiBoxHead
from . import anchors, matcher, sampler, proposals, losses

__all__ = [
    "FasterRCNN",
    "ResNetC4",
    "Res5Head",
    "FrozenBatchNorm",
    "RPNHead",
    "flatten_rpn_outputs",
    "RoiBoxHead",
    "anchors",
    "matcher",
    "sampler",
    "proposals",
    "losses",
]
