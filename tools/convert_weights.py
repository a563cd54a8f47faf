#!/usr/bin/env python
"""Convert pretrained backbone weights (torchvision .pth / Detectron .pkl)
into this framework's msgpack checkpoint format.

Usage: python tools/convert_weights.py resnet50.pth out_dir/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("src")
    parser.add_argument("out_dir")
    parser.add_argument("--name", default="imagenet_backbone")
    args = parser.parse_args()

    from abr_iod_tpu.utils.checkpoint import Checkpointer
    from abr_iod_tpu.utils.weight_converter import load_pretrained_backbone

    tree = load_pretrained_backbone(args.src)
    ck = Checkpointer(args.out_dir)
    path = ck.save(args.name, {"params": {"params": tree}}, trim=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
