"""Space-to-depth packed decoder: exactness vs the plain path.

The packed modules (models/packed_blocks.py) must compute the same function
as their plain twins on the SAME param tree — these tests pin both the
param-tree compatibility and the numerics (fp32, CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from enhanced_unet_tpu.models.blocks import DoubleConv, SCSEBlock
from enhanced_unet_tpu.models.enhanced_unet import NestedBlock, UNetPlusPlus
from enhanced_unet_tpu.models.packed_blocks import (
    PackedDoubleConv,
    PackedNestedBlock,
    PackedSCSE,
)
from enhanced_unet_tpu.ops.s2d import (
    conv3x3_s2d,
    depth_to_space,
    fused_up_kernel,
    s2d_kernel_same,
    space_to_depth,
    tile_as_packed_upsample,
)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.key(key), shape, dtype)


def _sorted_leaves(tree):
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    return sorted(leaves, key=lambda kv: jax.tree_util.keystr(kv[0]))


class TestS2DOps:
    def test_roundtrip(self):
        x = _rand(0, (2, 8, 6, 5))
        assert jnp.array_equal(depth_to_space(space_to_depth(x)), x)

    def test_packing_layout(self):
        # channel index (a*2+b)*C + c
        x = _rand(1, (1, 4, 4, 3))
        p = space_to_depth(x)
        np.testing.assert_allclose(p[0, 1, 1, 3 * 1 + 2],  # (a,b)=(0,1), c=2
                                   x[0, 2, 3, 2])
        np.testing.assert_allclose(p[0, 0, 0, 3 * 2 + 0],  # (a,b)=(1,0), c=0
                                   x[0, 1, 0, 0])

    def test_conv3x3_equivalence(self):
        x = _rand(2, (2, 16, 12, 5))
        w = _rand(3, (3, 3, 5, 7)) * 0.2
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = depth_to_space(
            conv3x3_s2d(space_to_depth(x), s2d_kernel_same(w)))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_tile_as_packed_upsample(self):
        x = _rand(4, (2, 8, 8, 6))
        up = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
        np.testing.assert_allclose(
            depth_to_space(tile_as_packed_upsample(x)), up)

    def test_fused_up_conv_equivalence(self):
        # conv3x3(nearest_up2x(x)) == d2s(conv3x3(x, fused_up_kernel(w)))
        x = _rand(5, (2, 9, 7, 4))
        w = _rand(6, (3, 3, 4, 6)) * 0.2
        up = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
        ref = jax.lax.conv_general_dilated(
            up, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = depth_to_space(
            conv3x3_s2d(None, None, up_input=x, up_kernel=fused_up_kernel(w)))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_mixed_packed_plus_up_equivalence(self):
        # conv over concat([packed part, nearest-up part]) == stuffed conv
        # of the packed part + fused-up conv of the low-res part
        xp = _rand(7, (2, 10, 10, 3))
        xl = _rand(8, (2, 5, 5, 4))
        w = _rand(9, (3, 3, 7, 6)) * 0.2
        up = jnp.repeat(jnp.repeat(xl, 2, 1), 2, 2)
        cat = jnp.concatenate([xp, up], axis=-1)
        ref = jax.lax.conv_general_dilated(
            cat, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = depth_to_space(conv3x3_s2d(
            [space_to_depth(xp)], s2d_kernel_same(w[:, :, :3, :]),
            up_input=xl, up_kernel=fused_up_kernel(w[:, :, 3:, :])))
        np.testing.assert_allclose(got, ref, atol=1e-5)


def _init_both(plain, packed, plain_args, packed_args):
    v_plain = plain.init(jax.random.key(7), *plain_args)
    v_packed = packed.init(jax.random.key(7), *packed_args)
    return v_plain, v_packed


class TestPackedBlocks:
    def test_scse_equivalence(self):
        x = _rand(10, (2, 16, 16, 8))
        plain = SCSEBlock(dtype=jnp.float32)
        packed = PackedSCSE(dtype=jnp.float32)
        vp, vq = _init_both(plain, packed, (x,), (space_to_depth(x),))
        # identical param trees (names + shapes + values: same RNG paths)
        chex_tree_equal(vp, vq)
        ref = plain.apply(vp, x)
        got = depth_to_space(packed.apply(vp, space_to_depth(x)))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_doubleconv_equivalence_train_and_eval(self):
        x = _rand(11, (2, 16, 16, 6))
        plain = DoubleConv(8, dtype=jnp.float32)
        packed = PackedDoubleConv(8, (6,), dtype=jnp.float32)
        vp, vq = _init_both(plain, packed, (x, False),
                            ([space_to_depth(x)], False))
        chex_tree_equal(vp, vq)
        ref = plain.apply(vp, x, False)
        got = depth_to_space(packed.apply(vp, [space_to_depth(x)], False))
        np.testing.assert_allclose(got, ref, atol=1e-4)
        # train mode: outputs AND updated batch stats must match
        ref, pm = plain.apply(vp, x, True, mutable=["batch_stats"])
        got, qm = packed.apply(vp, [space_to_depth(x)], True,
                               mutable=["batch_stats"])
        np.testing.assert_allclose(depth_to_space(got), ref, atol=1e-4)
        for (kp, sp), (kq, sq) in zip(_sorted_leaves(pm), _sorted_leaves(qm)):
            np.testing.assert_allclose(sq, sp, atol=1e-5, err_msg=str(kp))

    def test_nested_block_equivalence(self):
        f = _rand(12, (2, 16, 16, 5))
        s1 = _rand(13, (2, 16, 16, 8))
        below = _rand(14, (2, 8, 8, 10))
        plain = NestedBlock(8, dtype=jnp.float32)
        # smp concat order: [up(below), same[j-1], ..., same[0]]
        packed = PackedNestedBlock(8, (10, 8, 5), dtype=jnp.float32)
        vp, vq = _init_both(
            plain, packed,
            ([f, s1], below, False),
            ([space_to_depth(f), space_to_depth(s1)], below, False))
        chex_tree_equal(vp, vq)
        ref = plain.apply(vp, [f, s1], below, False)
        got = depth_to_space(packed.apply(
            vp, [space_to_depth(f), space_to_depth(s1)], below, False))
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_nested_block_equivalence_aligned22(self, monkeypatch):
        """The aligned-2x2 conv lowering (EUNET_S2D_IMPL=aligned22) computes
        the same NestedBlock function on the same param tree."""
        monkeypatch.setenv("EUNET_S2D_IMPL", "aligned22")
        f = _rand(12, (2, 16, 16, 5))
        s1 = _rand(13, (2, 16, 16, 8))
        below = _rand(14, (2, 8, 8, 10))
        plain = NestedBlock(8, dtype=jnp.float32)
        packed = PackedNestedBlock(8, (10, 8, 5), dtype=jnp.float32)
        vp, vq = _init_both(
            plain, packed,
            ([f, s1], below, False),
            ([space_to_depth(f), space_to_depth(s1)], below, False))
        chex_tree_equal(vp, vq)
        ref = plain.apply(vp, [f, s1], below, False)
        got = depth_to_space(packed.apply(
            vp, [space_to_depth(f), space_to_depth(s1)], below, False))
        np.testing.assert_allclose(got, ref, atol=1e-4)


def chex_tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    paths_a = [jax.tree_util.keystr(p) for p, _ in la]
    paths_b = [jax.tree_util.keystr(p) for p, _ in lb]
    assert paths_a == paths_b, (
        f"param tree mismatch:\nplain={paths_a}\npacked={paths_b}")
    for (pa, va), (_, vb) in zip(la, lb):
        assert va.shape == vb.shape, jax.tree_util.keystr(pa)
        np.testing.assert_allclose(va, vb, atol=0,
                                   err_msg=jax.tree_util.keystr(pa))


class TestPackedUNetPlusPlus:
    @pytest.mark.slow
    def test_full_branch_equivalence(self):
        x = _rand(20, (1, 64, 64, 3))
        plain = UNetPlusPlus(encoder_name="efficientnet-b0",
                             packed_decoder=False, dtype=jnp.float32)
        packed = UNetPlusPlus(encoder_name="efficientnet-b0",
                              packed_decoder=True, dtype=jnp.float32)
        vp = plain.init(jax.random.key(3), x, False)
        vq = packed.init(jax.random.key(3), x, False)
        chex_tree_equal(vp, vq)
        ref = plain.apply(vp, x, False)
        got = packed.apply(vp, x, False)
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_train_mode_stats_match(self):
        x = _rand(21, (1, 64, 64, 3))
        plain = UNetPlusPlus(encoder_name="efficientnet-b0",
                             packed_decoder=False, dtype=jnp.float32)
        packed = UNetPlusPlus(encoder_name="efficientnet-b0",
                              packed_decoder=True, dtype=jnp.float32)
        vp = plain.init(jax.random.key(3), x, False)
        rngs = {"dropout": jax.random.key(9)}
        ref, pm = plain.apply(vp, x, True, mutable=["batch_stats"],
                              rngs=rngs)
        got, qm = packed.apply(vp, x, True, mutable=["batch_stats"],
                               rngs=rngs)
        np.testing.assert_allclose(got, ref, atol=2e-3)
        for (kp, sp), (_, sq) in zip(_sorted_leaves(pm), _sorted_leaves(qm)):
            np.testing.assert_allclose(sq, sp, atol=1e-4,
                                       err_msg=jax.tree_util.keystr(kp))


class TestPackedFusion:
    """Round-5 packed fusion entry: the branch-logit concat + attention
    gate + residual run in the natural packing (EnhancedUNet.packed_fusion)
    — the [N,H,W,6] full-res fusion tensors never materialise."""

    def test_resize_align_corners_s2d_equivalence(self):
        from enhanced_unet_tpu.ops.resize import (
            resize_bilinear_align_corners,
            resize_bilinear_align_corners_s2d,
        )

        x = _rand(30, (2, 16, 24, 3))
        ref = space_to_depth(resize_bilinear_align_corners(x, (64, 96)))
        got = resize_bilinear_align_corners_s2d(x, (64, 96))
        assert got.shape == ref.shape == (2, 32, 48, 12)
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_resize_align_corners_s2d_odd_rejected(self):
        from enhanced_unet_tpu.ops.resize import (
            resize_bilinear_align_corners_s2d,
        )

        with pytest.raises(ValueError):
            resize_bilinear_align_corners_s2d(_rand(31, (1, 8, 8, 2)), (15, 16))

    def test_packed_conv1x1_equivalence(self):
        from enhanced_unet_tpu.models.packed_blocks import PackedConv1x1

        x = _rand(32, (2, 12, 12, 6))
        plain = nn.Conv(3, (1, 1), dtype=jnp.float32,
                        param_dtype=jnp.float32)
        packed = PackedConv1x1(3, 6, use_bias=True, dtype=jnp.float32)
        vp = plain.init(jax.random.key(5), x)
        vq = packed.init(jax.random.key(5), space_to_depth(x))
        chex_tree_equal(vp, vq)
        ref = plain.apply(vp, x)
        got = depth_to_space(packed.apply(vp, space_to_depth(x)))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    @pytest.mark.slow
    def test_enhanced_unet_packed_fusion_equivalence(self):
        from enhanced_unet_tpu.models.enhanced_unet import EnhancedUNet

        x = _rand(33, (1, 64, 64, 3))
        kw = dict(encoder_names=("efficientnet-tiny", "efficientnet-tiny"),
                  drop_connect_rate=0.0, aspp_dropout=0.0,
                  fusion_dropout=(0.0, 0.0), dtype=jnp.float32)
        plain = EnhancedUNet(packed_fusion=False, **kw)
        packed = EnhancedUNet(packed_fusion=True, **kw)
        vp = plain.init({"params": jax.random.key(7)}, x, False)
        vq = packed.init({"params": jax.random.key(7)}, x, False)
        chex_tree_equal(vp, vq)
        ref, aux_ref = plain.apply(vp, x, False)
        got, aux_got = packed.apply(vp, x, False)
        np.testing.assert_allclose(got, ref, atol=2e-3)
        for k in aux_ref:
            np.testing.assert_allclose(aux_got[k], aux_ref[k], atol=2e-3)

    @pytest.mark.slow
    def test_enhanced_unet_packed_fusion_train_stats(self):
        from enhanced_unet_tpu.models.enhanced_unet import EnhancedUNet

        x = _rand(34, (1, 64, 64, 3))
        kw = dict(encoder_names=("efficientnet-tiny", "efficientnet-tiny"),
                  drop_connect_rate=0.0, aspp_dropout=0.0,
                  fusion_dropout=(0.0, 0.0), dtype=jnp.float32)
        plain = EnhancedUNet(packed_fusion=False, **kw)
        packed = EnhancedUNet(packed_fusion=True, **kw)
        vp = plain.init({"params": jax.random.key(8)}, x, False)
        rngs = {"dropout": jax.random.key(9)}
        (ref, _), pm = plain.apply(vp, x, True, mutable=["batch_stats"],
                                   rngs=rngs)
        (got, _), qm = packed.apply(vp, x, True, mutable=["batch_stats"],
                                    rngs=rngs)
        np.testing.assert_allclose(got, ref, atol=2e-3)
        for (kp, sp), (_, sq) in zip(_sorted_leaves(pm), _sorted_leaves(qm)):
            np.testing.assert_allclose(sq, sp, atol=1e-4,
                                       err_msg=jax.tree_util.keystr(kp))
