"""Multi-chip parallelism: Mesh construction + shard_map data parallelism.

The reference is single-GPU with no distributed code (SURVEY §2); this layer
is the TPU-native scaling design: a 1-D `Mesh('data')` with per-chip batches,
`pmean` gradient reduction over ICI, and BatchNorm running statistics
averaged across replicas.  Collectives are inserted by XLA from the
shard_map program — no NCCL/MPI analogue exists or is needed.
"""

from enhanced_unet_tpu.parallel.mesh import make_mesh
from enhanced_unet_tpu.parallel.data_parallel import (
    make_dp_train_step,
    replicate_state,
    make_global_batch,
    shard_batch,
)
from enhanced_unet_tpu.parallel.spatial import make_spatial_apply
from enhanced_unet_tpu.parallel.tiled import tiled_inference_sharded
from enhanced_unet_tpu.parallel.tensor_parallel import (
    make_mesh_2d,
    make_tp_apply,
    make_tp_train_step,
    shard_params_tp,
    tp_param_specs,
)

__all__ = [
    "make_mesh",
    "make_dp_train_step",
    "replicate_state",
    "make_global_batch",
    "shard_batch",
    "tiled_inference_sharded",
    "make_spatial_apply",
    "make_mesh_2d",
    "tp_param_specs",
    "shard_params_tp",
    "make_tp_apply",
    "make_tp_train_step",
]
