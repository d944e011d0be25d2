"""ssd3d — a TPU-native (JAX/XLA/Pallas/pjit) point-cloud 3D detection framework.

Re-implements the capabilities of the 3DSSD reference stack (3DSSD single-stage
detector + PointRCNN two-stage detector, KITTI/nuScenes pipelines, config-driven
backbones) as an idiomatic JAX framework:

- fixed-shape, jit-compiled pure functions instead of TF1 graphs + feed_dicts
- Pallas TPU kernels for the point-neighborhood ops (FPS, ball query, grouping)
- pjit/shard_map over a device Mesh for data parallelism (SyncBN for free)
- on-device target assignment and NMS (no host round-trips in the train step)

Reference (public upstream, studied for behavior only): dvlab-research/3DSSD.
"""

__version__ = "0.1.0"
