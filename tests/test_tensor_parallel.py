"""Tensor parallelism (parallel/tensor_parallel.py) on the virtual 8-device
CPU mesh: spec rules, forward equivalence with real channel sharding, and
the hybrid DP x TP train step (SURVEY §2 parallelism table, TP row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from enhanced_unet_tpu.models import get_model
from enhanced_unet_tpu.parallel import (
    make_mesh_2d,
    make_tp_apply,
    make_tp_train_step,
    shard_params_tp,
    tp_param_specs,
)

def _init(model, shape):
    return model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros(shape, jnp.float32), train=False,
    )


def test_tp_specs_column_and_row():
    model = get_model("unet_basic", dtype=jnp.float32)
    variables = _init(model, (1, 32, 32, 3))
    specs = tp_param_specs(variables["params"], min_channels=128)
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): s
        for path, s in jax.tree_util.tree_flatten_with_path(specs)[0]
    }
    # first conv of a wide DoubleConv: column split (Cout)
    assert flat["DoubleConv_2/ConvBNAct_0/Conv_0/kernel"] == P(
        None, None, None, "model")
    # second conv of the pair: row split (Cin)
    assert flat["DoubleConv_2/ConvBNAct_1/Conv_0/kernel"] == P(
        None, None, "model", None)
    # narrow convs and non-kernel params stay replicated
    assert flat["DoubleConv_0/ConvBNAct_0/Conv_0/kernel"] == P()
    assert flat["DoubleConv_2/ConvBNAct_0/BatchNorm_0/scale"] == P()


def test_tp_forward_matches_unsharded():
    model = get_model("unet_basic", dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).random((4, 32, 32, 3)),
                    jnp.float32)
    variables = _init(model, (1, 32, 32, 3))
    ref, _ = model.apply(variables, x, train=False)

    mesh = make_mesh_2d(2, 4)
    params_tp = shard_params_tp(variables["params"], mesh, min_channels=128)
    # the wide kernels must actually be split over 'model'
    k = params_tp["DoubleConv_3"]["ConvBNAct_0"]["Conv_0"]["kernel"]
    shard_shape = k.addressable_shards[0].data.shape
    assert shard_shape[3] == k.shape[3] // 4, (shard_shape, k.shape)

    fwd = make_tp_apply(model, mesh)
    out = fwd({"params": params_tp,
               "batch_stats": variables.get("batch_stats", {})}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_tp_train_step_matches_single_program():
    """Hybrid DP x TP GSPMD step == the plain jitted step (same global-batch
    BN semantics, same loss trajectory)."""
    from enhanced_unet_tpu.config import get_preset
    from enhanced_unet_tpu.train.trainer import (
        create_train_state,
        make_train_step,
    )

    cfg = get_preset("unet", num_epochs=4)
    model = get_model("unet_basic", dtype=jnp.float32)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
    masks = jnp.asarray(rng.integers(0, 3, (8, 32, 32)), jnp.int32)
    valid = jnp.ones((8, 32, 32), bool)

    def run(tp: bool, n_steps: int = 3):
        state = create_train_state(model, cfg, steps_per_epoch=1,
                                   rng=jax.random.key(0),
                                   input_shape=(1, 32, 32, 3))
        if tp:
            mesh = make_mesh_2d(2, 4)
            state = state.replace(
                params=shard_params_tp(state.params, mesh, min_channels=128))
            step = make_tp_train_step(cfg, mesh)
        else:
            step = jax.jit(make_train_step(cfg, axis_name=None))
        losses = []
        for _ in range(n_steps):
            state, metrics = step(state, images, masks, valid,
                                  jax.random.key(2))
            losses.append(float(metrics["loss"]))
        return losses, state

    losses_ref, _ = run(tp=False)
    losses_tp, state_tp = run(tp=True)
    # step 1 runs on identical weights: tight equality proves the sharded
    # forward+backward+loss graph computes the single-program math.  Later
    # steps drift chaotically: sharded contractions sum partials in a
    # different order and AdamW amplifies ~1e-7 grad noise per-weight
    # (m/rsqrt(v) is O(1)-sensitive for near-zero grads) — so only bounded
    # trajectory agreement is asserted there.
    np.testing.assert_allclose(losses_tp[0], losses_ref[0], rtol=1e-5)
    np.testing.assert_allclose(losses_tp, losses_ref, rtol=5e-3)
    # the optimizer update must keep the wide kernels sharded (no silent
    # re-gather): the updated param still has 1/4-width addressable shards
    k_tp = state_tp.params["DoubleConv_3"]["ConvBNAct_0"]["Conv_0"]["kernel"]
    assert (k_tp.addressable_shards[0].data.shape[3] == k_tp.shape[3] // 4)


@pytest.mark.slow
def test_tp_forward_flagship():
    """The dual-branch flagship under TP: the fusion head's 6->256 conv
    column-splits and its 256->128 successor row-splits; forward equals
    the unsharded model (b0 encoders keep the CPU compile tractable)."""
    model = get_model(
        "enhanced_unet", dtype=jnp.float32,
        encoder_names=("efficientnet-b0", "efficientnet-b0"))
    x = jnp.asarray(np.random.default_rng(2).random((2, 64, 64, 3)),
                    jnp.float32)
    variables = _init(model, (1, 64, 64, 3))
    ref, _ = model.apply(variables, x, train=False)

    specs = tp_param_specs(variables["params"], min_channels=128)
    assert specs["ConvBNAct_0"]["Conv_0"]["kernel"] == P(
        None, None, None, "model")
    assert specs["ConvBNAct_1"]["Conv_0"]["kernel"] == P(
        None, None, "model", None)

    mesh = make_mesh_2d(2, 4)
    params_tp = shard_params_tp(variables["params"], mesh, min_channels=128)
    fwd = make_tp_apply(model, mesh)
    out = fwd({"params": params_tp,
               "batch_stats": variables.get("batch_stats", {})}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
