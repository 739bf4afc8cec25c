"""shard_map data-parallel training.

Design (BASELINE.json config 5): replicate params/optimizer state, shard the
batch over Mesh('data'); each replica computes its forward/backward, then
`pmean` reduces gradients and loss over ICI and BatchNorm running statistics
are averaged so replicas stay bit-identical.  XLA lowers the pmean to an
all-reduce over the mesh axis; there is no hand-written communication.

Per-step normalization stats stay per-replica (batch 2/replica), matching
the reference's single-device BN semantics (train_eval.py:1059).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from enhanced_unet_tpu.config import TrainConfig
from enhanced_unet_tpu.train.trainer import TrainState, make_train_step


def make_dp_train_step(cfg: TrainConfig, mesh: Mesh, axis_name: str = "data"):
    """Jitted data-parallel train step.

    Call with a replicated TrainState and a GLOBAL batch whose leading axis
    divides the mesh size; returns (new_state, metrics) with metrics already
    pmean-reduced.
    """
    step = make_train_step(cfg, axis_name=axis_name)

    state_spec = P()          # replicated (prefix-broadcast over the pytree)
    data_spec = P(axis_name)  # batch-sharded on the leading axis

    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(state_spec, data_spec, data_spec, data_spec, state_spec),
        out_specs=(state_spec, state_spec),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=0)


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place every leaf of the train state replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)


def shard_batch(batch_leaves, mesh: Mesh, axis_name: str = "data"):
    """Place [B, ...] arrays batch-sharded over the mesh axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch_leaves)
