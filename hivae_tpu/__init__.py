"""hivae_tpu — a TPU-native rebuild of the Hi-VAE video autoencoding framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the PyTorch
reference (HuaizeLiu/Hi-VAE): frequency-decoupled camera/object motion
encoding, rectified-flow diffusion-transformer video decoding, audio/pose/
text-to-motion conditioning heads, and windowed autoregressive inference
pipelines — designed for SPMD execution over TPU device meshes.

Layout:
  ops/        pure-functional numerics (rectified flow, FFT filters, wavelets,
              embeddings, attention + Pallas kernels)
  models/     flax.linen model zoo (VAE, motion encoders, DiT zoo, AMD/A2M/A2P)
  parallel/   mesh construction + sharding rules (dp/fsdp/tp over one Mesh)
  losses/     LPIPS / reconstruction / discriminator losses
  data/       host-side input pipeline (video decode, resize, flow masks)
  training/   train states, optimizers, Orbax checkpointing, trainers
  pipelines/  inference pipelines (video recon, audio->video)
  utils/      torch-checkpoint conversion, config IO, misc
"""

__version__ = "0.1.0"
