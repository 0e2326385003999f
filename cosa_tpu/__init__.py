"""CoSA-TPU: a TPU-native weakly-supervised semantic segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of youshyee/CoSA
(ECCV 2024, "Weakly Supervised Co-training with Swapping Assignments for
Semantic Segmentation"): dual-network co-training of a ViT-B that jointly
learns multi-label classification, CAM generation and dense segmentation from
image-level labels only.

Architecture (TPU-first, not a port):
  * one pjit-compiled train step: teacher multi-scale TTA, student fwd/bwd,
    all losses (cls / seg / cam / dense-energy), optimizer and EMA teacher
    update run as a single XLA program on a ``jax.sharding.Mesh``
    (reference: per-iteration Python loop + NCCL DDP, main.py:106-385).
  * pseudo-label generation never leaves the device: the CPU/SWIG
    permutohedral bilateral filter (reference utils/bilateralfilter/*) is
    replaced by an on-device Gaussian-kernel factorization (ops/bilateral.py)
    with a custom VJP, and CAM->mask refinement is fully batched
    (objectives/pseudo.py vs. the per-image Python loop in
    utils/seg_helper.py:766-778).
  * data parallelism via batch sharding over a ('data','model') mesh with
    XLA-inserted collectives; an optional model axis tensor-shards the ViT
    MLP/attention, something the reference (DDP-only) cannot do.
"""

__version__ = "0.1.0"

from cosa_tpu import config as config  # noqa: F401
