"""abr_iod_tpu — a TPU-native incremental object detection framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of ABR_IOD
(ICCV 2023, "Augmented Box Replay"): Faster R-CNN R-50-C4 detection,
class-incremental training with inclusive distillation + attentive RoI
distillation, and box-rehearsal replay with on-device mixup/mosaic fusion.

Design principles (TPU-first, not a port):
  * static shapes everywhere — padded box arrays + validity masks
  * one jit-compiled train step (teacher + student + losses + optimizer)
  * SPMD via jax.sharding.Mesh / NamedSharding, collectives by XLA
  * hot ops (RoIAlign, NMS) as MXU-native einsum formulations / Pallas
  * bf16 compute policy instead of AMP loss scaling
"""

__version__ = "0.1.0"
