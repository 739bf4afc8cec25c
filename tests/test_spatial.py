"""Spatial-partition ops with halo exchange == unsharded versions (8 devices)."""

import jax
import jax.numpy as jnp
import numpy as np

from enhanced_unet_tpu.parallel import make_mesh
from enhanced_unet_tpu.parallel.spatial import (
    halo_exchange,
    make_spatial_basic_unet,
    make_spatial_conv3x3,
    shard_image_h,
)


def test_spatial_conv_matches_unsharded(rng):
    mesh = make_mesh(8, axis_name="space")
    h, w, cin, cout = 64, 32, 8, 16
    x = jnp.asarray(rng.normal(size=(h, w, cin)), jnp.float32)
    wgt = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.float32)

    expected = jax.lax.conv_general_dilated(
        x[None], wgt, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]

    conv = make_spatial_conv3x3(mesh, "space")
    got = conv(shard_image_h(x, mesh, "space"), wgt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-5)


def test_halo_exchange_contents(rng):
    """Each shard's halo must be exactly the neighbour's boundary rows."""
    mesh = make_mesh(8, axis_name="space")
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    x = jnp.arange(64 * 4 * 2, dtype=jnp.float32).reshape(64, 4, 2)

    f = shard_map(
        lambda xl: halo_exchange(xl, 1, "space"),
        mesh=mesh,
        in_specs=P("space", None, None),
        out_specs=P("space", None, None),
        check_vma=False,
    )
    out = np.asarray(jax.jit(f)(shard_image_h(x, mesh, "space")))
    # output is [8 shards * 10 rows, 4, 2]; shard i rows = [halo_top, 8 rows,
    # halo_bottom]
    xs = np.asarray(x).reshape(8, 8, 4, 2)
    out = out.reshape(8, 10, 4, 2)
    for i in range(8):
        np.testing.assert_array_equal(out[i, 1:9], xs[i])
        if i > 0:
            np.testing.assert_array_equal(out[i, 0], xs[i - 1, -1])
        else:
            np.testing.assert_array_equal(out[i, 0], np.zeros((4, 2)))
        if i < 7:
            np.testing.assert_array_equal(out[i, 9], xs[i + 1, 0])
        else:
            np.testing.assert_array_equal(out[i, 9], np.zeros((4, 2)))


def test_spatial_basic_unet_matches_unsharded(rng):
    """Whole-model H-sharded BasicUNet inference == stock model.apply.

    Exercises halo-exchanged convs at four resolutions, local pools, and
    edge-clamped halo bilinear upsampling, on the standard checkpoint
    tree."""
    from enhanced_unet_tpu.models.unet import BasicUNet

    mesh = make_mesh(8, axis_name="space")
    h, w = 128, 32  # H_local = 16, divisible by 8 (three pools)
    x = jnp.asarray(rng.normal(size=(h, w, 3)), jnp.float32)

    model = BasicUNet(num_classes=3, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, h, w, 3)),
                           train=False)
    expected, _ = model.apply(variables, x[None], train=False)

    fwd = make_spatial_basic_unet(mesh, "space")
    got = fwd(variables, shard_image_h(x, mesh, "space"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected[0]),
                               atol=2e-4, rtol=1e-3)


def test_gspmd_spatial_basic_unet(rng):
    """GSPMD spatial partitioning (XLA-derived halos) == unsharded model."""
    from enhanced_unet_tpu.models import get_model
    from enhanced_unet_tpu.parallel.spatial import make_spatial_apply

    mesh = make_mesh(8, axis_name="space")
    model = get_model("unet_basic", dtype=jnp.float32)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False)
    ref, _ = model.apply(variables, x, train=False)
    fwd = make_spatial_apply(model, mesh, "space")
    got = fwd(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_gspmd_spatial_flagship(rng):
    """The flagship (dual-branch, packed decoder, scSE/ASPP global pools)
    runs spatially partitioned through GSPMD and matches unsharded — the
    whole-model coverage the hand-rolled halo path provides for BasicUNet
    only (b0 encoders keep the CPU compile tractable; identical structure
    to the b5/b4 pairing)."""
    from enhanced_unet_tpu.models import get_model
    from enhanced_unet_tpu.parallel.spatial import make_spatial_apply

    mesh = make_mesh(8, axis_name="space")
    model = get_model(
        "enhanced_unet", dtype=jnp.float32,
        encoder_names=("efficientnet-b0", "efficientnet-b0"))
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False)
    ref, _ = model.apply(variables, x, train=False)
    fwd = make_spatial_apply(model, mesh, "space")
    got = fwd(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
