"""npcd_tpu — TPU-native Neural Point Cloud Diffusion framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
lmb-freiburg/neural-point-cloud-diffusion (CVPR 2024): a two-stage generative
pipeline over neural point clouds (NPCs).

  * Stage 1: a PointNeRF autodecoder — per-object coordinate + variational
    feature embedding tables decoded to images by a point-based NeRF
    (kNN feature aggregation + volume rendering), trained with
    reconstruction + KL + total-variation losses.
  * Stage 2: a DDPM over the (coords, feats) point-cloud latents with a
    transformer denoiser that jointly denoises shape and appearance.

Design principles (TPU-first, not a port):
  * fixed shapes everywhere: dense masked tensors instead of the reference's
    ragged masked_select/index_add pipelines
  * everything under jit: train steps (incl. EMA) are single jitted
    functions; the 1000-step DDPM sampler is one lax.scan
  * scale-out via jax.sharding.Mesh + shard_map with psum over ICI
  * Pallas kernels for the hot ops (flash attention, voxel kNN)
"""

__version__ = "0.1.0"

from . import utils  # noqa: F401
