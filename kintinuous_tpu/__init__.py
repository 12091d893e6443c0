"""kintinuous_tpu — a TPU-native dense RGB-D SLAM engine.

A from-scratch re-design of the capabilities of mp3guy/Kintinuous
(real-time spatially-extended KinectFusion) for TPU hardware:

- the frontend (depth preprocessing, coarse-to-fine point-to-plane ICP +
  photometric RGB-D odometry, TSDF fusion, raycasting, rolling-volume
  shifting and cloud-slice extraction) is a single jitted JAX step
  function over HBM-resident donated volume arrays — no per-iteration
  host syncs (the reference's biggest latency sin,
  reference: src/frontend/cuda/reduce.cu:401-418);
- the backend (slice processing, meshing, place recognition, pose-graph
  optimization, embedded-deformation map correction) is a host pipeline
  whose numeric cores (batched linear algebra, feature matching,
  deformation apply) are jitted JAX;
- multi-chip scaling goes through jax.sharding Meshes (volume z-slabs +
  pixel-row sharding with psum/ppermute collectives), not translated
  thread code.

Reference layer map: /root/reference/src (see SURVEY.md).
"""

__version__ = "0.1.0"

from kintinuous_tpu.config import KintinuousConfig

__all__ = ["KintinuousConfig", "__version__"]
