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
import numpy as np
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
    """Place every leaf of the train state replicated over the mesh.

    Multi-host: every process holds the full (identically-initialized)
    value, so the replicated global array is assembled from process-local
    data; single-process is a plain device_put.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), state)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        state,
    )


def shard_batch(batch_leaves, mesh: Mesh, axis_name: str = "data"):
    """Place GLOBAL [B, ...] arrays batch-sharded over the mesh axis.

    Single-process only: `jax.device_put` cannot place data on another
    host's devices.  Multi-host callers build per-process local batches
    and assemble them with `make_global_batch` instead.
    """
    if jax.process_count() > 1:
        raise RuntimeError(
            "shard_batch requires a single-process runtime; under "
            "jax.distributed (process_count="
            f"{jax.process_count()}) load a process-LOCAL batch "
            "(BatchLoader(process_shard=...)) and assemble it with "
            "make_global_batch()."
        )
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch_leaves)


def make_global_batch(local_leaves, mesh: Mesh, axis_name: str = "data"):
    """Assemble per-process LOCAL batches into global batch-sharded arrays.

    Each process passes its own [B_local, ...] leaves (B_global =
    B_local * process_count); rows land on the process's addressable
    devices via jax.make_array_from_process_local_data, so this works on
    multi-host slices where device_put onto non-addressable devices
    cannot.  Single-process, it degrades to shard_batch semantics.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    pc = jax.process_count()
    if pc == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), local_leaves)

    def put(x):
        x = np.asarray(x)  # device->host once; required host-local input
        global_shape = (x.shape[0] * pc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(put, local_leaves)
