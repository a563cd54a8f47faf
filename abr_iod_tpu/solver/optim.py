"""Optimizer + LR schedule (reference: solver/build.py, solver/lr_scheduler.py).

Semantics reproduced:
  * SGD momentum 0.9; per-parameter groups — biases get lr × BIAS_LR_FACTOR
    and WEIGHT_DECAY_BIAS (solver/build.py:7-22)
  * WarmupMultiStepLR: linear warmup over WARMUP_ITERS from WARMUP_FACTOR,
    ×GAMMA at each milestone (solver/lr_scheduler.py:10-52)
  * "requires_grad = False" freezing becomes an optax multi_transform
    mask: FrozenBatchNorm constants, FREEZE_CONV_BODY_AT stages, and the
    per-submodule freeze flags all map to a zero-update group
    (reference resnet.py:134-143, rpn.py:86-113)
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

FROZEN_BN_SEGMENTS = ("bn1", "bn2", "bn3", "downsample_bn")


def warmup_multistep_schedule(cfg_solver) -> Callable:
    milestones = tuple(cfg_solver.STEPS)
    gamma = float(cfg_solver.GAMMA)
    warmup_iters = int(cfg_solver.WARMUP_ITERS)
    warmup_factor = float(cfg_solver.WARMUP_FACTOR)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        wf = jnp.where(
            step < warmup_iters, warmup_factor * (1 - alpha) + alpha, 1.0
        )
        decay = gamma ** sum(
            [jnp.asarray(step >= m, jnp.float32) for m in milestones]
        ) if milestones else 1.0
        return wf * decay

    return schedule


def _path_names(path) -> list:
    names = []
    for p in path:
        names.append(getattr(p, "key", getattr(p, "name", str(p))))
    return [str(n) for n in names]


def param_labels(params, cfg_model) -> Any:
    """Label each leaf 'frozen' | 'bias' | 'weight' from its tree path."""
    freeze_at = int(cfg_model.BACKBONE.FREEZE_CONV_BODY_AT)
    # ALL_FREEZE is the reference's name (backbone.py:46-53); FREEZE is
    # this repo's round-1 alias — either freezes the whole conv body
    backbone_freeze = bool(cfg_model.BACKBONE.get("FREEZE", False)) or bool(
        cfg_model.BACKBONE.get("ALL_FREEZE", False)
    )
    fpn_freeze = backbone_freeze or bool(cfg_model.BACKBONE.get("FPN_FREEZE", False))
    rpn_freeze = bool(cfg_model.RPN.get("FREEZE", False))
    rpn_conv_freeze = bool(cfg_model.RPN.CONV_FREEZE)
    rpn_cls_freeze = bool(cfg_model.RPN.CLS_FREEZE)
    rpn_bbs_freeze = bool(cfg_model.RPN.BBS_FREEZE)
    roi_cls_freeze = bool(cfg_model.ROI_HEADS.CLS_FREEZE)
    roi_bbs_freeze = bool(cfg_model.ROI_HEADS.BBS_FREEZE)

    def label(path, leaf):
        names = _path_names(path)
        if any(n in FROZEN_BN_SEGMENTS for n in names):
            return "frozen"
        if "backbone" in names:
            if backbone_freeze:
                return "frozen"
            if freeze_at >= 1 and "stem" in names:
                return "frozen"
            for s in range(1, freeze_at):
                if f"layer{s}" in names:
                    return "frozen"
        if "fpn" in names and fpn_freeze:
            return "frozen"
        if "rpn" in names:
            if rpn_freeze:
                return "frozen"
            if rpn_conv_freeze and "conv" in names:
                return "frozen"
            if rpn_cls_freeze and "cls_logits" in names:
                return "frozen"
            if rpn_bbs_freeze and "bbox_pred" in names:
                return "frozen"
        if "roi_heads" in names:
            if roi_cls_freeze and "cls_score" in names:
                return "frozen"
            if roi_bbs_freeze and "bbox_pred" in names:
                return "frozen"
        if names[-1] == "bias":
            return "bias"
        return "weight"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(cfg, params) -> optax.GradientTransformation:
    base_lr = float(cfg.SOLVER.BASE_LR)
    schedule = warmup_multistep_schedule(cfg.SOLVER)

    def sgd(lr_scale: float, weight_decay: float):
        return optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay > 0 else optax.identity(),
            optax.sgd(
                learning_rate=lambda step: base_lr * lr_scale * schedule(step),
                momentum=float(cfg.SOLVER.MOMENTUM),
            ),
        )

    labels = param_labels(params, cfg.MODEL)
    return optax.multi_transform(
        {
            "weight": sgd(1.0, float(cfg.SOLVER.WEIGHT_DECAY)),
            "bias": sgd(
                float(cfg.SOLVER.BIAS_LR_FACTOR), float(cfg.SOLVER.WEIGHT_DECAY_BIAS)
            ),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
