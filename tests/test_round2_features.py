"""Round-2 product wiring: DP through the public train API, tiled
inference as an Evaluator/CLI feature, loader prefetch, reference-exact
validation gating, gradient-flow capture.

These exercise the PRODUCT paths (train_model / evaluate_model / Evaluator),
not just the underlying library functions, on the 8-virtual-device CPU mesh
(SURVEY §4c).
"""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from synthdata import make_synthetic_dataset

from enhanced_unet_tpu.config import get_preset
from enhanced_unet_tpu.data.dataset import CellDataset
from enhanced_unet_tpu.data.loader import BatchLoader
from enhanced_unet_tpu.train.api import evaluate_model, train_model
from enhanced_unet_tpu.train.evaluator import Evaluator
from enhanced_unet_tpu.train.trainer import TrainState, create_train_state

pytestmark = pytest.mark.slow  # compile-heavy lane (see pyproject.toml)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cells_r2")
    make_synthetic_dataset(str(d), n_images=7, size=96)
    return str(d)


# ---------------------------------------------------------------------------
# data-parallel training through the public API (VERDICT round-1 item 5)
# ---------------------------------------------------------------------------

def test_train_model_data_parallel_e2e(data_dir, tmp_path):
    """train_model(num_devices=4) runs the shard_map DP path end-to-end:
    global batches, pmean grads, replicated checkpoints."""
    cfg = get_preset("unet", num_epochs=1, data_dir=data_dir)
    cfg = dataclasses.replace(cfg, num_epochs=1, eval_every_epochs=1,
                              batch_size=1)
    ckpt = train_model(
        "unet_basic", data_dir=data_dir, num_epochs=1,
        checkpoint_dir=str(tmp_path / "ck_dp"), max_size=96, cfg=cfg,
        dtype=jnp.float32, num_devices=4, use_full_evaluator_gate=False,
        log=lambda *a: None,
    )
    assert os.path.exists(os.path.join(ckpt, "meta.json"))
    with open(os.path.join(ckpt, "meta.json")) as f:
        meta = json.load(f)
    assert len(meta["history"]["train_loss"]) == 1
    assert np.isfinite(meta["history"]["train_loss"][0])


def test_train_model_num_devices_from_config(data_dir, tmp_path):
    """cfg.num_devices alone (no explicit arg) also routes through DP."""
    cfg = get_preset("unet", num_epochs=1, data_dir=data_dir)
    cfg = dataclasses.replace(cfg, num_epochs=1, eval_every_epochs=1,
                              batch_size=1, num_devices=2)
    ckpt = train_model(
        "unet_basic", data_dir=data_dir, num_epochs=1,
        checkpoint_dir=str(tmp_path / "ck_dp2"), max_size=96, cfg=cfg,
        dtype=jnp.float32, use_full_evaluator_gate=False,
        log=lambda *a: None,
    )
    assert os.path.exists(os.path.join(ckpt, "meta.json"))


# ---------------------------------------------------------------------------
# tiled inference as a product feature (VERDICT round-1 item 4)
# ---------------------------------------------------------------------------

class _TinyNet(nn.Module):
    """3-class head with a 5px receptive field: tile interiors must match the
    whole-image forward almost everywhere, making the tiled-vs-whole golden
    comparison tight."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(8, (3, 3), padding="SAME")(x)
        y = nn.relu(y)
        y = nn.Conv(3, (3, 3), padding="SAME")(y)
        return y.astype(jnp.float32), {}


def _tiny_state():
    model = _TinyNet()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=(),
        apply_fn=model.apply,
        tx=None,
    )


def test_tiled_probs_match_whole_image_golden(rng):
    """Golden: tiled full-res probabilities ~= whole-image probabilities on a
    1280x960 synthetic image (the reference would DOWNSCALE this image,
    dataset.py:143-158; our long-context subsystem must not)."""
    state = _tiny_state()
    img = rng.random((960, 1280, 3)).astype(np.float32)

    ev_tiled = Evaluator(state, "unet_basic", enable_tta=False, verbose=False,
                         tiled=True, tile=512, overlap=64)
    probs_tiled = ev_tiled.predict_probs_tiled(img)

    # whole-image oracle with the same enhance step
    enhanced = np.asarray(ev_tiled._enhance(jnp.asarray(img)))
    logits, _ = state.apply_fn({"params": state.params}, enhanced[None])
    probs_whole = np.asarray(jax.nn.softmax(logits[0], axis=-1))

    assert probs_tiled.shape == probs_whole.shape == (960, 1280, 3)
    np.testing.assert_allclose(probs_tiled.sum(-1), 1.0, atol=1e-4)
    # interiors are exact; only conv-border halos inside each tile differ,
    # and the Hann blend suppresses those
    diff = np.abs(probs_tiled - probs_whole)
    assert diff.mean() < 1e-3, diff.mean()
    assert np.quantile(diff, 0.999) < 0.05


def test_tiled_mask_agrees_with_whole_image(rng):
    state = _tiny_state()
    # dims /32-snapped like the real pipeline (CLAHE needs /8 tiles)
    img = rng.random((192, 320, 3)).astype(np.float32)
    ev_whole = Evaluator(state, "unet_basic", enable_tta=False, verbose=False)
    ev_tiled = Evaluator(state, "unet_basic", enable_tta=False, verbose=False,
                         tiled=True, tile=96, overlap=32)
    m_whole = ev_whole.predict_semantic_mask(img)
    m_tiled = ev_tiled.predict_semantic_mask(img)
    assert m_tiled.shape == m_whole.shape
    agreement = (m_tiled == m_whole).mean()
    assert agreement > 0.98, agreement


def test_device_tiled_program_matches_host_stitching(rng):
    """The one-device-program tiled pipeline (r4: one image upload, tiles
    cut/stitched/thresholded on device — the host-stitch path measured
    32 s/img over the axon relay from tile-batch uploads) computes the
    SAME mask as the host-stitching path."""
    state = _tiny_state()
    img = rng.random((192, 320, 3)).astype(np.float32)
    ev = Evaluator(state, "unet_basic", enable_tta=False, verbose=False,
                   tiled=True, tile=96, overlap=32)
    # device program path (shape cache fills)
    m_dev = ev.predict_semantic_mask(img)
    assert (192, 320) in ev._tiled_programs
    # host-stitch path on the same evaluator
    from enhanced_unet_tpu.ops.thresholding import convert_probs_to_mask

    probs_host = ev.predict_probs_tiled(img)
    m_host = np.asarray(convert_probs_to_mask(jnp.asarray(probs_host)))
    assert m_dev.shape == m_host.shape
    np.testing.assert_array_equal(m_dev, m_host)


def test_batched_tiled_program_matches_per_image(rng):
    """predict_semantic_masks_tiled (r5: one vmapped device program per
    image batch — per-call RTT amortises over B images) returns exactly
    the per-image device-program masks, as uint8."""
    state = _tiny_state()
    imgs = rng.random((2, 192, 320, 3)).astype(np.float32)
    ev = Evaluator(state, "unet_basic", enable_tta=False, verbose=False,
                   tiled=True, tile=96, overlap=32)
    m_batch = ev.predict_semantic_masks_tiled(imgs)
    assert m_batch.shape == (2, 192, 320)
    assert m_batch.dtype == np.uint8
    for i in range(2):
        m_single = ev.predict_semantic_mask(imgs[i])
        np.testing.assert_array_equal(m_batch[i], m_single)


def test_tiled_device_program_single_chunk_default(rng):
    """tile_batch=None (the default) runs the whole grid as one chunk:
    a 192x320/96/32 grid is 2x4=8 tiles with no pad waste."""
    state = _tiny_state()
    img = rng.random((192, 320, 3)).astype(np.float32)
    ev = Evaluator(state, "unet_basic", enable_tta=False, verbose=False,
                   tiled=True, tile=96, overlap=32)
    assert ev.tile_batch is None
    m = ev.predict_semantic_mask(img)
    assert m.dtype == np.uint8 and m.shape == (192, 320)


def test_evaluate_model_tiled_flag(data_dir, tmp_path):
    """The public evaluate_model(tiled=True) path produces the full metric
    dict (CLI --tiled)."""
    results = evaluate_model(
        "unet_basic", data_dir=data_dir,
        checkpoint_path=str(tmp_path / "missing"),  # random init is fine
        results_dir=str(tmp_path / "res_tiled"), max_size=96,
        dtype=jnp.float32, generate_visualizations=False,
        tiled=True, tile=64, overlap=16, log=lambda *a: None,
    )
    for key in ("sem_mean_iou", "viability_accuracy", "segm_mAP"):
        assert key in results and np.isfinite(results[key])


# ---------------------------------------------------------------------------
# loader prefetch (VERDICT round-1 item 7)
# ---------------------------------------------------------------------------

def test_prefetch_yields_identical_batches(data_dir):
    ds = CellDataset(data_dir, split="train", max_size=96)
    a = BatchLoader(ds, 2, (96, 96), train=True, seed=3, prefetch=0)
    b = BatchLoader(ds, 2, (96, 96), train=True, seed=3, prefetch=2)
    batches_a = list(a)
    batches_b = list(b)
    assert len(batches_a) == len(batches_b) > 0
    for ba, bb in zip(batches_a, batches_b):
        np.testing.assert_array_equal(
            np.asarray(ba["images"]), np.asarray(bb["images"]))
        np.testing.assert_array_equal(
            np.asarray(ba["semantic_masks"]), np.asarray(bb["semantic_masks"]))
        assert ba["n_real"] == bb["n_real"]


def test_prefetch_early_break_does_not_hang(data_dir):
    ds = CellDataset(data_dir, split="train", max_size=96)
    loader = BatchLoader(ds, 1, (96, 96), train=False, prefetch=2)
    for batch in loader:
        break  # abandoning the iterator must not deadlock the producer
    # a second full iteration still works
    assert len(list(loader)) == len(loader)


def test_prefetch_propagates_producer_errors(data_dir):
    ds = CellDataset(data_dir, split="train", max_size=96)
    loader = BatchLoader(ds, 1, (96, 96), train=False, prefetch=2)
    loader.dataset = None  # force an error inside the producer thread
    with pytest.raises(Exception):
        list(loader)


# ---------------------------------------------------------------------------
# reference-exact validation gate + gradient-flow capture (items 6 & 9)
# ---------------------------------------------------------------------------

def test_full_evaluator_gate_default_and_grad_norms(data_dir, tmp_path):
    """Default gating runs the FULL Evaluator (reference
    train_eval.py:1119-1135) and the history captures per-parameter gradient
    magnitudes for plot_gradient_flow."""
    cfg = get_preset("unet", num_epochs=1, data_dir=data_dir)
    cfg = dataclasses.replace(cfg, num_epochs=1, eval_every_epochs=1)
    ckpt = train_model(
        "unet_basic", data_dir=data_dir, num_epochs=1,
        checkpoint_dir=str(tmp_path / "ck_gate"), max_size=96, cfg=cfg,
        dtype=jnp.float32, log=lambda *a: None,
    )
    with open(os.path.join(ckpt, "meta.json")) as f:
        meta = json.load(f)
    h = meta["history"]
    # the full gate produced a val entry
    assert len(h["val_miou"]) == 1
    # gradient-flow capture: non-empty {param_path: mean|grad|}
    assert isinstance(h["grad_norms"], dict) and len(h["grad_norms"]) > 0
    assert all(np.isfinite(v) for v in h["grad_norms"].values())


def test_evaluator_update_state_changes_predictions(rng):
    """update_state swaps parameters without recompiling: predictions must
    reflect the new params (the jitted pipeline takes params as arguments)."""
    state = _tiny_state()
    ev = Evaluator(state, "unet_basic", enable_tta=False, verbose=False)
    img = rng.random((64, 64, 3)).astype(np.float32)
    p1 = ev.predict_probs(img)
    bumped = state.replace(
        params=jax.tree.map(lambda x: x + 1.0, state.params))
    ev.update_state(bumped)
    p2 = ev.predict_probs(img)
    assert not np.allclose(p1, p2)


def test_evaluator_batched_matches_per_image(rng):
    """predict_semantic_masks (the BENCH_MODE=eval serving path) must equal
    per-image predict_semantic_mask: same enhance->TTA->cascade semantics,
    just batched onto one forward per view-group."""
    state = _tiny_state()
    for tta in (False, True):
        ev = Evaluator(state, "unet_basic", enable_tta=tta, verbose=False)
        imgs = rng.random((3, 64, 64, 3)).astype(np.float32)
        batched = ev.predict_semantic_masks(imgs)
        assert batched.shape == (3, 64, 64)
        for i in range(3):
            single = ev.predict_semantic_mask(imgs[i])
            np.testing.assert_array_equal(batched[i], single)


def test_evaluate_grouped_batching_matches_per_image(data_dir):
    """Evaluator.evaluate with a batch>1 loader (device half grouped by
    shape) produces the identical metric dict to the reference-exact
    batch-1 loop (VERDICT r2 weak #8)."""
    state = _tiny_state()
    ds = CellDataset(data_dir, split="val", max_size=96)
    ev = Evaluator(state, "unet_basic", verbose=False)
    m1 = ev.evaluate(BatchLoader(ds, 1, (96, 96), train=False,
                                 preprocess=False))
    m4 = ev.evaluate(BatchLoader(ds, 4, (96, 96), train=False,
                                 preprocess=False))
    for k, v in m1.items():
        np.testing.assert_allclose(m4[k], v, rtol=1e-6, atol=1e-7,
                                   err_msg=k)


def test_predict_model_label_free(data_dir, tmp_path):
    """predict_model runs the serving pipeline on bare images (no JSON),
    writing mask/overlay PNGs and the predictions CSV."""
    from enhanced_unet_tpu.train.api import predict_model

    out = predict_model(
        "unet_basic", images_dir=data_dir, results_dir=str(tmp_path),
        max_size=96, dtype=jnp.float32, batch_size=4,
        log=lambda *a: None,
    )
    rows = out["predictions"]
    assert len(rows) == len(
        [f for f in os.listdir(data_dir) if f.endswith(".jpg")])
    for r in rows:
        assert 0.0 <= r["viability_percent"] <= 100.0
        stem = os.path.splitext(r["filename"])[0]
        assert os.path.exists(os.path.join(out["save_dir"], f"{stem}_mask.png"))
        assert os.path.exists(
            os.path.join(out["save_dir"], f"{stem}_overlay.png"))
    assert os.path.exists(os.path.join(out["save_dir"], "predictions.csv"))
