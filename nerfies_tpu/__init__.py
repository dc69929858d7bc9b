"""nerfies_tpu: a TPU-native deformable neural radiance field framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of google/nerfies
(Nerfies: Deformable Neural Radiance Fields, ICCV 2021). The compute path is
built for TPU hardware: batched functional encoders and fields (large fused
matmuls on the MXU), `jit` + `jax.sharding` SPMD over device meshes instead of
`pmap`, MXU-friendly rewrites of ops XLA lowers badly on TPU (one-hot-matmul
inverse-CDF resampling, closed-form 3x3 singular values for the elastic
regularizer), and bf16 compute with f32 compositing.

Public surface parity with the reference (see SURVEY.md):
  - gin-style config zoo (``nerfies_tpu.minigin``; gin is reimplemented here)
  - the nerfies on-disk dataset format (``nerfies_tpu.datasets``)
  - train/eval CLI entry points (``train.py`` / ``eval.py`` at the repo root)
"""

__version__ = '0.1.0'
