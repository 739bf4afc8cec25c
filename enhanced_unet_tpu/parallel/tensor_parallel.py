"""Tensor parallelism via GSPMD channel sharding (SURVEY §2 stretch row).

The reference is single-GPU (SURVEY: "no model sharding anywhere"); this is
the TPU-native tensor-parallel design for the zoo's convolutional models:

- a 2-D ``Mesh(('data','model'))``: batch rides the 'data' axis (the
  shard_map DP design in data_parallel.py), channels of the WIDE layers ride
  'model'.
- conv kernels [kh,kw,Cin,Cout] with Cout >= min_channels are sharded on
  their output-channel axis (Megatron "column" split); the second conv of a
  DoubleConv pair is sharded on its INPUT-channel axis (the "row" split), so
  the pair needs exactly one all-reduce, inserted by XLA — the classic
  Megatron pattern expressed purely as sharding annotations.  Everything
  else (biases, BN params, narrow kernels) stays replicated; GSPMD slices
  or broadcasts them as the propagated activation shardings require.
- BatchNorm statistics are per-channel reductions over (N,H,W), so a
  channel-sharded activation yields exact global statistics with no extra
  collectives — each shard owns complete channels.

Unlike the shard_map DP path (which replicates per-device BN batches to
match the reference's single-GPU semantics, train_eval.py:1059), the TP
train step is a single GSPMD program: BN batch statistics are computed over
the GLOBAL batch.  That is the textbook BN definition and the documented
deviation of this mode.

No communication is hand-written anywhere: XLA chooses and schedules the
all-gathers/all-reduces over ICI from the annotations alone
(jax-ml.github.io/scaling-book recipe: pick a mesh, annotate, let XLA
insert collectives).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from enhanced_unet_tpu.config import TrainConfig
from enhanced_unet_tpu.train.trainer import TrainState, make_train_step

__all__ = [
    "make_mesh_2d",
    "tp_param_specs",
    "shard_params_tp",
    "make_tp_apply",
    "make_tp_train_step",
]


def make_mesh_2d(
    n_data: int,
    n_model: int,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """2-D mesh: 'data' (batch) x 'model' (channel) axes.

    On hardware, lay the 'model' axis along the fastest ICI dimension (the
    all-reduces of the row-split convs ride it every layer); 'data' sees one
    gradient reduction per step.
    """
    devices = jax.devices()
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(
            f"requested {n_data}x{n_model} devices, only {len(devices)} available"
        )
    grid = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(grid, axis_names)


def _is_row_split(path: Tuple[str, ...]) -> bool:
    """Second conv of a conv-BN-act pair -> input-channel ("row") split.

    Matches the zoo's DoubleConv/ConvBNAct naming (ConvBNAct_1 inside a
    DoubleConv; the fusion head's ConvBNAct_1 chain position) — the conv
    whose producer is itself a wide sharded conv, so splitting its INPUT
    axis consumes the producer's output sharding with no re-gather and
    yields one all-reduce after the pair.
    """
    names = [p for p in path]
    for i, n in enumerate(names):
        if n == "ConvBNAct_1" and i + 1 < len(names) and names[i + 1].startswith("Conv"):
            return True
    return False


def tp_param_specs(params, min_channels: int = 128, axis: str = "model"):
    """PartitionSpec pytree for TP: wide conv kernels sharded on Cout
    (column) or Cin (row, see _is_row_split); everything else replicated."""

    def spec(path, leaf):
        names = tuple(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path
        )
        if (
            hasattr(leaf, "ndim") and leaf.ndim == 4
            and names and str(names[-1]) == "kernel"
        ):
            cin, cout = leaf.shape[2], leaf.shape[3]
            if _is_row_split(names) and cin >= min_channels:
                return P(None, None, axis, None)
            if cout >= min_channels:
                return P(None, None, None, axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_tp(params, mesh: Mesh, min_channels: int = 128,
                    axis: str = "model"):
    """device_put the param tree with TP shardings on `mesh`."""
    specs = tp_param_specs(params, min_channels=min_channels, axis=axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def make_tp_apply(model, mesh: Mesh, data_axis: str = "data"):
    """Jitted TP forward: params as placed by shard_params_tp, batch sharded
    on the data axis.  Returns fn(variables, x) -> logits."""

    batch_sh = NamedSharding(mesh, P(data_axis))

    @jax.jit
    def fwd(variables, x):
        x = jax.lax.with_sharding_constraint(x, batch_sh)
        out = model.apply(variables, x, train=False)
        return out[0] if isinstance(out, tuple) else out

    return fwd


def make_tp_train_step(cfg: TrainConfig, mesh: Mesh, data_axis: str = "data"):
    """Jitted hybrid DP x TP train step as ONE GSPMD program.

    The TrainState's params/opt-state carry their TP shardings (gradients
    and moments inherit them); the batch is sharded on the data axis.  Loss
    is the global-batch mean, so the data-parallel gradient reduction is
    implicit in the program — XLA emits the cross-'data' all-reduce.  BN
    uses global-batch statistics (see module docstring).
    """
    step = make_train_step(cfg, axis_name=None)
    batch_sh = NamedSharding(mesh, P(data_axis))

    @jax.jit
    def tp_step(state: TrainState, images, masks, valid, rng):
        images = jax.lax.with_sharding_constraint(images, batch_sh)
        return step(state, images, masks, valid, rng)

    return tp_step
