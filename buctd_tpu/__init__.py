"""buctd_tpu — TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
amathislab/BUCTD (Bottom-Up Conditioned Top-Down pose estimation, ICCV 2023).

Built from scratch, TPU-first:
  * batched, jit-compiled preprocessing (affine warp, Gaussian targets, condition
    rendering) instead of the reference's per-sample cv2 CPU hot loop,
  * flax NHWC models (HRNet / HRNet+CoAM / TransPose-H / PoseResNet) in bf16-friendly
    layouts,
  * fully-vectorized on-device decode (argmax, DARK) and flip-test averaging,
  * jax.sharding data parallelism over a TPU mesh.
"""

__version__ = "0.1.0"
