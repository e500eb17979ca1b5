"""AMMCNet-TPU: a TPU-native (JAX/XLA/Pallas/pjit) video anomaly-detection framework.

A from-scratch rebuild of the capabilities of NjuHaoZhang/AMMCNet_AAAI2021
(AAAI 2021, "Appearance-Motion Memory Consistency Network for Video Anomaly
Detection"): future-frame prediction with twin appearance (RGB) and motion
(optical-flow) conv autoencoder streams, discrete top-k memory modules at the
bottlenecks, and an appearance-motion feature-transfer (AMFT) bridge.  Frames
that predict badly (low PSNR) or sit far from the learned memory of normal
patterns (high commit distance) are anomalous.

Unlike the reference (single-GPU PyTorch), everything here is designed
TPU-first: NHWC convs compiled by XLA onto the MXU, the memory-addressing op
available both as pure JAX and as a fused Pallas kernel, scoring fused into
the same jit region as the model forward (no per-frame host round-trips), and
scale-out expressed as `jax.sharding` over a device mesh rather than any
NCCL-style collectives.
"""

__version__ = "0.1.0"
