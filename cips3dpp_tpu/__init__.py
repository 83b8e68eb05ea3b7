"""CIPS-3D++ TPU: a TPU-native (JAX/XLA/Pallas/pjit) 3D-aware GAN framework.

A from-scratch re-design of the capabilities of PeterouZh/CIPS-3Dplusplus
(style-modulated SDF-NeRF renderer + CIPS super-resolution decoder, dual
discriminator GAN training, GAN inversion, multi-view synthesis) built
TPU-first: static shapes, functional transforms, sharded train steps over
`jax.sharding.Mesh`, and Pallas kernels for the hot ops.
"""

__version__ = "0.1.0"
