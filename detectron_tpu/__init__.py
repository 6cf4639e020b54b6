"""detectron_tpu — a TPU-native object-detection framework in JAX.

A from-scratch rebuild of the capability surface of roytseng-tw/Detectron.pytorch
(Faster/Mask/Keypoint R-CNN with ResNet/ResNeXt C4 and FPN backbones), designed
TPU-first:

- All model compute is pure-functional JAX, jit-compiled with static shapes.
- Proposal generation, NMS, RoIAlign and training-time target assignment run
  inside the jitted step (the reference does them in per-image numpy loops on
  the host: lib/modeling/generate_proposals.py :: GenerateProposalsOp,
  lib/roi_data/*.py).
- Data parallelism is a jax.sharding.Mesh + pjit'd train step with implicit
  gradient psum (replaces the reference's lib/nn/parallel/data_parallel.py).
- Hot ops (RoIAlign, NMS) have Pallas TPU kernels in detectron_tpu/ops/pallas.
- The yaml `cfg` surface mirrors the reference's lib/core/config.py so that
  e2e_{faster,mask,keypoint}_rcnn configs run unchanged.
"""

__version__ = "0.1.0"
