"""geomapnet_tpu — a TPU-native JAX framework for geometry-aware camera localization.

A from-scratch rebuild of the capabilities of NVlabs/geomapnet (MapNet, CVPR'18):
PoseNet / MapNet / MapNet++ camera-pose regressors, the geometry-aware
absolute+relative pose losses with learnable homoscedastic-uncertainty weights,
7Scenes / Oxford RobotCar data pipelines, and pose-graph-optimization (PGO)
inference — all designed TPU-first:

- pure-functional jnp geometry core (vmap/jit-safe quaternion + SE(3) algebra)
- Flax ResNet-34 trunk with bfloat16 compute on the MXU
- jit-compiled train/eval steps sharded over a ``jax.sharding.Mesh``
- jittable, vmapped Gauss-Newton pose-graph optimizer (reference runs scipy
  on the host per sample; we batch the whole trajectory on device)
- orbax checkpointing, optax optimizers, fixed-shape device-resident batches
"""

__version__ = "0.1.0"
