"""lgd_tpu: a TPU-native (JAX/Flax/XLA/Pallas) detection-distillation framework
with the capabilities of megvii-research/LGD (AAAI 2022, arXiv 2109.11496).

Label-Guided self-Distillation: a dynamic teacher feature pyramid is
synthesized per step from GT labels + the student's own FPN features
(label-appearance encoding -> inter-object relation adaptation via
cross-attention -> intra-object knowledge mapping), trained end-to-end with
the student and discarded at inference.

Everything on the device path is shape-static, padded, and jit-compiled;
data parallelism is expressed with jax.sharding over a device mesh.
"""

__version__ = "0.1.0"
