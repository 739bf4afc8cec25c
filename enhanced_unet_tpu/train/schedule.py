"""Learning-rate schedule: linear warmup + cosine annealing with warm
restarts, with torch-identical semantics.

Parity target: reference train_eval.py:109-132 (scheduler construction) and
train_eval.py:1100-1111 (epoch-granular stepping BEFORE each epoch's
training).  The reference steps `warmup_scheduler` (LinearLR,
start_factor=0.001) for epochs < warmup_epochs and `scheduler`
(CosineAnnealingWarmRestarts, T_0=max(10, total//3), T_mult=2, eta_min=1e-7)
afterwards.  Because only one of the two schedulers is stepped per epoch,
the cosine scheduler's T_cur starts advancing from the first post-warmup
epoch (its construction-time state is T_cur=0).

`reference_lr_schedule` reproduces the exact per-epoch LR sequence;
tests/test_schedule.py checks it element-wise against real torch schedulers.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np


def reference_lr_schedule(
    base_lr: float,
    total_epochs: int,
    warmup_epochs: int,
    t0: int,
    t_mult: int = 2,
    eta_min: float = 1e-7,
    start_factor: float = 0.001,
) -> np.ndarray:
    """Per-epoch LR as the reference training loop sees it.

    Epoch e's LR is the value in effect during epoch e's training, i.e.
    after the pre-epoch scheduler step (train_eval.py:1104-1111).
    """
    lrs = np.zeros(total_epochs, dtype=np.float64)
    t_i = t0
    t_cur = 0
    for epoch in range(total_epochs):
        if epoch < warmup_epochs:
            # torch LinearLR closed form after k steps
            k = epoch + 1
            factor = start_factor + (1.0 - start_factor) * min(
                k, warmup_epochs
            ) / warmup_epochs
            lrs[epoch] = base_lr * factor
        else:
            # torch CosineAnnealingWarmRestarts.step(): advance T_cur first,
            # roll over into the next (T_mult-scaled) cycle, then compute.
            t_cur += 1
            if t_cur >= t_i:
                t_cur -= t_i
                t_i *= t_mult
            lrs[epoch] = eta_min + (base_lr - eta_min) * (
                1 + math.cos(math.pi * t_cur / t_i)
            ) / 2
    return lrs


def make_lr_fn(
    lr_table: Sequence[float], steps_per_epoch: int
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """optax-compatible schedule: step count -> epoch-granular LR lookup.

    The table is baked into the jitted program as a constant; lookups clip at
    the last epoch so extra steps keep the final LR.
    """
    table = jnp.asarray(np.asarray(lr_table, dtype=np.float32))

    def lr_fn(count: jnp.ndarray) -> jnp.ndarray:
        epoch = count // steps_per_epoch
        return table[jnp.clip(epoch, 0, table.shape[0] - 1)]

    return lr_fn
