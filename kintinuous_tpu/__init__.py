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

import jax as _jax

# TPU MXU matmuls default to bfloat16 inputs. Every geometry matmul in
# the tracking path (pose @ delta, SE3 transforms, GN system builds)
# would silently re-quantise metre-scale coordinates to ~1 cm each frame
# — measured 0.4 cm/frame pose drift on a 512^3 GT replay, the round-3
# corridor tracking killer. These contractions are a few MFLOP/frame, so
# full f32 costs nothing; the genuinely MXU-bound kernels
# (ops/pallas_*) choose bf16 explicitly where it is safe.
_jax.config.update("jax_default_matmul_precision", "float32")

from kintinuous_tpu.config import KintinuousConfig

__all__ = ["KintinuousConfig", "__version__"]
