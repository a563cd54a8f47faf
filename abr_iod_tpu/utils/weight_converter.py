"""Pretrained backbone weight conversion.

Reference: utils/c2_model_loading.py (Detectron/Caffe2 pkl → torch key
renaming) + the catalog:// resolution in utils/checkpoint.py:120-142.
This environment has no egress, so instead of downloading we convert
local files:

  * torchvision-style ResNet-50 state dicts (``resnet50.pth``)
  * Detectron/Caffe2 ``R-50.pkl`` blob dicts (conv1_w, res2_0_branch2a_w,
    …_bn_s/_bn_b — affine-only frozen BN, exactly our FrozenBatchNorm)

into this framework's param tree (backbone stem+layer1-3, RoI-head res5).
Layout notes: torch convs are [out, in, kh, kw] → flax [kh, kw, in, out].
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _conv(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def convert_torchvision_resnet50(state_dict: Dict[str, "np.ndarray"]) -> Dict:
    """torchvision resnet50 names → our tree:
    {'backbone': {stem, layer1..3}, 'roi_heads': {'res5': {'layer4': …}}}."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: Dict = {"backbone": {}, "roi_heads": {"res5": {}}}

    _set(out, ("backbone", "stem", "conv1", "kernel"), _conv(sd["conv1.weight"]))
    for stat, ours in (
        ("weight", "weight"), ("bias", "bias"),
        ("running_mean", "running_mean"), ("running_var", "running_var"),
    ):
        _set(out, ("backbone", "stem", "bn1", ours), sd[f"bn1.{stat}"])

    def dest_for_layer(layer: int):
        if layer <= 3:
            return ("backbone", f"layer{layer}")
        return ("roi_heads", "res5", "layer4")

    block_counts = {1: 3, 2: 4, 3: 6, 4: 3}
    for layer, n_blocks in block_counts.items():
        base = dest_for_layer(layer)
        for b in range(n_blocks):
            for ci in (1, 2, 3):
                _set(out, base + (f"block{b}", f"conv{ci}", "kernel"),
                     _conv(sd[f"layer{layer}.{b}.conv{ci}.weight"]))
                for stat in ("weight", "bias", "running_mean", "running_var"):
                    _set(out, base + (f"block{b}", f"bn{ci}", stat),
                         sd[f"layer{layer}.{b}.bn{ci}.{stat}"])
            dk = f"layer{layer}.{b}.downsample.0.weight"
            if dk in sd:
                _set(out, base + (f"block{b}", "downsample_conv", "kernel"), _conv(sd[dk]))
                for stat in ("weight", "bias", "running_mean", "running_var"):
                    _set(out, base + (f"block{b}", "downsample_bn", stat),
                         sd[f"layer{layer}.{b}.downsample.1.{stat}"])
    return out


def convert_caffe2_resnet50(blobs: Dict[str, "np.ndarray"]) -> Dict:
    """Detectron R-50.pkl blobs → our tree (reference c2_model_loading
    naming: res{L}_{B}_branch2{a,b,c}_w + _bn_s/_bn_b, branch1 =
    downsample; caffe2 frozen BN is affine-only → running stats 0/1)."""
    out: Dict = {"backbone": {}, "roi_heads": {"res5": {}}}

    def put_bn(base_path, prefix):
        s = np.asarray(blobs[prefix + "_s"])
        b = np.asarray(blobs[prefix + "_b"])
        _set(out, base_path + ("weight",), s)
        _set(out, base_path + ("bias",), b)
        _set(out, base_path + ("running_mean",), np.zeros_like(s))
        _set(out, base_path + ("running_var",), np.ones_like(s))

    _set(out, ("backbone", "stem", "conv1", "kernel"), _conv(blobs["conv1_w"]))
    put_bn(("backbone", "stem", "bn1"), "res_conv1_bn")

    block_counts = {2: 3, 3: 4, 4: 6, 5: 3}  # caffe2 res2..res5
    branch_to_conv = {"a": 1, "b": 2, "c": 3}
    for res_idx, n_blocks in block_counts.items():
        layer = res_idx - 1  # our layer1..4
        base = (
            ("backbone", f"layer{layer}") if layer <= 3
            else ("roi_heads", "res5", "layer4")
        )
        for b in range(n_blocks):
            for br, ci in branch_to_conv.items():
                _set(out, base + (f"block{b}", f"conv{ci}", "kernel"),
                     _conv(blobs[f"res{res_idx}_{b}_branch2{br}_w"]))
                put_bn(base + (f"block{b}", f"bn{ci}"),
                       f"res{res_idx}_{b}_branch2{br}_bn")
            k1 = f"res{res_idx}_{b}_branch1_w"
            if k1 in blobs:
                _set(out, base + (f"block{b}", "downsample_conv", "kernel"),
                     _conv(blobs[k1]))
                put_bn(base + (f"block{b}", "downsample_bn"),
                       f"res{res_idx}_{b}_branch1_bn")
    return out


def load_pretrained_backbone(path: str) -> Dict:
    """Dispatch by file type: .pth/.pt (torch) or .pkl (Detectron)."""
    if path.endswith((".pth", ".pt")):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if "state_dict" in sd:
            sd = sd["state_dict"]
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
        return convert_torchvision_resnet50(sd)
    if path.endswith(".pkl"):
        import pickle

        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        blobs = data.get("blobs", data)
        return convert_caffe2_resnet50(blobs)
    raise ValueError(f"unsupported weight file {path!r}")
