"""Registry (reference: utils/registry.py + modeling/registry.py):
a dict with a register decorator, used for pluggable backbones/heads."""

from __future__ import annotations


def _register_generic(module_dict, module_name, module):
    assert module_name not in module_dict, f"{module_name} already registered"
    module_dict[module_name] = module


class Registry(dict):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)

    def register(self, module_name, module=None):
        if module is not None:  # function call style
            _register_generic(self, module_name, module)
            return module

        def register_fn(fn):  # decorator style
            _register_generic(self, module_name, fn)
            return fn

        return register_fn


# registries mirroring modeling/registry.py
BACKBONES = Registry()
RPN_HEADS = Registry()
ROI_BOX_FEATURE_EXTRACTORS = Registry()
ROI_BOX_PREDICTORS = Registry()
ROI_MASK_FEATURE_EXTRACTORS = Registry()
ROI_MASK_PREDICTORS = Registry()
ROI_KEYPOINT_FEATURE_EXTRACTORS = Registry()
ROI_KEYPOINT_PREDICTORS = Registry()
