"""Full evaluation pipeline.

Parity target: reference Evaluator (train_eval.py:356-1021):
- inference preprocess (CLAHE + sharpen) — on-device (ops.preprocess)
- TTA forwards for enhanced_unet (ops.tta)
- heuristic prob->mask conversion (ops.thresholding)
- semantic metrics (metrics.semantic)
- instance extraction (postprocess.instances, host)
- instance metrics / COCO RLE annotations / viability (metrics.*)

The device portion (preprocess -> 5 TTA forwards -> threshold cascade) is
one jit per input shape; only the final int mask crosses to the host for
the morphology stage.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from enhanced_unet_tpu.config import TrainConfig
from enhanced_unet_tpu.data.rle import encode_rle, mask_to_bbox
from enhanced_unet_tpu.metrics.coco import calculate_coco_metrics
from enhanced_unet_tpu.metrics.instance import calculate_instance_metrics
from enhanced_unet_tpu.metrics.semantic import calculate_semantic_metrics
from enhanced_unet_tpu.metrics.viability import calculate_viability_metrics
from enhanced_unet_tpu.ops.preprocess import eval_preprocess
from enhanced_unet_tpu.ops.thresholding import convert_probs_to_mask
from enhanced_unet_tpu.ops.tta import run_model_single, tta_probs, tta_probs_batch

_METRIC_KEYS = (
    "sem_mean_iou", "sem_mean_dice",
    "sem_background_iou", "sem_background_dice",
    "sem_live_iou", "sem_live_dice", "sem_dead_iou", "sem_dead_dice",
    "live_iou", "live_precision", "live_recall", "live_ap",
    "dead_iou", "dead_precision", "dead_recall", "dead_ap",
    "bbox_mAP", "segm_mAP",
    "viability_accuracy", "pred_viability", "gt_viability",
    "pred_live_count", "pred_dead_count", "gt_live_count", "gt_dead_count",
)


class Evaluator:
    """Evaluate a trained state over a dataset, reference-metric-complete.

    tiled=True switches inference to full-resolution sliding-window tiling
    with Hann overlap-blend stitching (the framework's long-context
    subsystem; the reference instead DOWNSCALES large micrographs to
    max_size=640, dataset.py:143-158).  Pass a Mesh to shard the tile batch
    over multiple chips (parallel/tiled.py pattern).
    """

    def __init__(self, state, model_name: str, enable_tta: Optional[bool] = None,
                 verbose: bool = True, tiled: bool = False, tile: int = 512,
                 overlap: int = 64, tile_batch: Optional[int] = None,
                 mesh=None):
        self.state = state
        self.model_name = model_name
        self.verbose = verbose
        self.tiled = tiled
        self.tile = tile
        self.overlap = overlap
        # None = auto: the device tiled program runs ALL tiles of an image
        # as one forward (no pad waste, one dispatch — a 2048^2/512/64 grid
        # is 25 tiles, well inside the measured batch-64 inference ceiling);
        # the host-stitching fallback chunks at 8 so its fixed-shape tile
        # program is reusable across image sizes
        self.tile_batch = tile_batch
        self.mesh = mesh
        # TTA iff enhanced_unet (train_eval.py:363)
        self.enable_tta = (
            (model_name == "enhanced_unet") if enable_tta is None else enable_tta
        )

        # the jitted pipelines take (params, batch_stats) as ARGUMENTS so one
        # Evaluator instance is reusable across training gate epochs with
        # updated state — no per-gate recompilation
        apply_raw = state.apply_fn

        def pipeline(params, batch_stats, img):
            def apply_fn(x):
                logits, _ = apply_raw(
                    {"params": params, "batch_stats": batch_stats}, x,
                    train=False,
                )
                return logits

            enhanced = eval_preprocess(img * 255.0) / 255.0
            probs = tta_probs(apply_fn, enhanced, self.enable_tta)
            return convert_probs_to_mask(probs)

        def probs_pipeline(params, batch_stats, img):
            def apply_fn(x):
                logits, _ = apply_raw(
                    {"params": params, "batch_stats": batch_stats}, x,
                    train=False,
                )
                return logits

            return run_model_single(apply_fn, img)

        def batch_pipeline(params, batch_stats, imgs):
            # [B,H,W,3] -> [B,H,W] int masks; every TTA view of every image
            # rides one large forward (see ops.tta.tta_probs_batch), the
            # cascade is vmapped so its density statistics stay per-image
            def apply_fn(x):
                logits, _ = apply_raw(
                    {"params": params, "batch_stats": batch_stats}, x,
                    train=False,
                )
                return logits

            enhanced = jax.vmap(
                lambda im: eval_preprocess(im * 255.0) / 255.0)(imgs)
            probs = tta_probs_batch(apply_fn, enhanced, self.enable_tta)
            return jax.vmap(convert_probs_to_mask)(probs)

        def enhance(img):
            # native-size CLAHE+sharpen (train_eval.py:380-392)
            return eval_preprocess(img * 255.0) / 255.0

        def tile_fwd(params, batch_stats, tiles):
            # one compiled program for every tile batch: [B,t,t,3] -> probs
            def apply_fn(x):
                logits, _ = apply_raw(
                    {"params": params, "batch_stats": batch_stats}, x,
                    train=False,
                )
                return logits

            if self.enable_tta:
                return jax.vmap(lambda t: tta_probs(apply_fn, t, True))(tiles)
            return jax.nn.softmax(
                apply_fn(tiles).astype(jnp.float32), axis=-1)

        self._pipeline = jax.jit(pipeline)
        # public: the jitted [B,H,W,3]->[B,H,W] serving pipeline (enhance ->
        # TTA -> cascade); bench.py chains it through lax.fori_loop
        self.batch_pipeline = jax.jit(batch_pipeline)
        self._batch_pipeline = self.batch_pipeline  # back-compat alias
        self._probs_pipeline = jax.jit(probs_pipeline)
        self._enhance = jax.jit(enhance)
        self._tile_fwd = jax.jit(tile_fwd)
        self._tile_fwd_raw = tile_fwd  # untraced body for the device program
        self._enhance_raw = enhance
        self._tiled_programs: dict = {}  # (h, w) -> jitted device program

    def update_state(self, state) -> None:
        """Swap in fresh parameters (same model/shape): keeps all compiled
        programs valid — used by the every-3-epochs training gate."""
        self.state = state

    def predict_semantic_mask(self, image01: np.ndarray) -> np.ndarray:
        """image01: [H,W,3] float in [0,1] -> int mask [H,W].

        Mirrors train_eval.py:570-652: every model family gets the
        CLAHE+sharpen enhance; enhanced_unet additionally runs TTA.
        tiled=True runs the sliding-window path instead (full resolution,
        one compiled tile program regardless of image size).
        """
        if self.tiled:
            h, w = int(image01.shape[0]), int(image01.shape[1])
            # fixed-shape single-chip serving gets the WHOLE tiled pipeline
            # as one device program (one image upload, tiles cut /
            # forwarded / Hann-stitched / thresholded on device, one uint8
            # mask download).  The host-stitching path (predict_probs_tiled)
            # remains for shape churn — it reuses one tile program for any
            # size, but pays a full tile-batch upload + probs download per
            # image (measured 32 s/img over the axon relay vs device-side
            # stitching) — and for multi-chip meshes, where it shards the
            # tile batch over Mesh('data') (the device program would run
            # single-device and silently lose the mesh).
            if self.mesh is None and (
                    (h, w) in self._tiled_programs
                    or len(self._tiled_programs) < 8):
                prog = self._tiled_programs.get((h, w))
                if prog is None:
                    prog = jax.jit(self._tiled_run_body(h, w))
                    self._tiled_programs[(h, w)] = prog
                return self._unpack_mask_wire(
                    np.asarray(prog(
                        self.state.params, self.state.batch_stats,
                        jnp.asarray(image01, jnp.float32))), w)
            probs = self.predict_probs_tiled(image01)
            return np.asarray(convert_probs_to_mask(jnp.asarray(probs))
                              .astype(jnp.uint8))
        return np.asarray(
            self._pipeline(
                self.state.params, self.state.batch_stats,
                jnp.asarray(image01, jnp.float32),
            )
        )

    def _tiled_run_body(self, h: int, w: int):
        """Un-jitted [h,w,3] image -> [h,w] uint8 mask body: enhance ->
        static tile grid -> tile forwards (one chunk covering the whole
        grid by default — no padded-tile waste, one dispatch; TTA per tile
        iff enabled, same as the host path) -> Hann overlap-blend
        accumulation -> threshold cascade.  jit for the one-image device
        program; vmap+jit for the batched multi-image program."""
        from enhanced_unet_tpu.ops.tiling import _tile_positions, hann_window_2d

        tile, overlap = self.tile, self.overlap
        stride = tile - overlap
        if stride <= 0:
            raise ValueError("overlap must be smaller than tile")
        pad_h, pad_w = max(tile - h, 0), max(tile - w, 0)
        ph, pw = h + pad_h, w + pad_w
        positions = [
            (y, x)
            for y in _tile_positions(ph, tile, stride)
            for x in _tile_positions(pw, tile, stride)
        ]
        window = jnp.asarray(hann_window_2d(tile))[..., None]
        bs = self.tile_batch or len(positions)
        tile_fwd = self._tile_fwd_raw
        enhance = self._enhance_raw

        def run(params, batch_stats, img):
            img = enhance(img)
            if pad_h or pad_w:
                img = jnp.pad(img, ((0, pad_h), (0, pad_w), (0, 0)),
                              mode="reflect")
            tiles = jnp.stack(
                [img[y:y + tile, x:x + tile] for (y, x) in positions])
            n = tiles.shape[0]
            n_pad = (-n) % bs
            if n_pad:
                tiles = jnp.concatenate(
                    [tiles, jnp.zeros((n_pad, tile, tile, 3), tiles.dtype)])
            chunks = [
                tile_fwd(params, batch_stats, tiles[s:s + bs])
                for s in range(0, tiles.shape[0], bs)
            ]
            probs = (chunks[0] if len(chunks) == 1
                     else jnp.concatenate(chunks))[:n]
            acc = jnp.zeros((ph, pw, probs.shape[-1]), jnp.float32)
            wacc = jnp.zeros((ph, pw, 1), jnp.float32)
            for i, (y, x) in enumerate(positions):
                acc = acc.at[y:y + tile, x:x + tile].add(probs[i] * window)
                wacc = wacc.at[y:y + tile, x:x + tile].add(window)
            full = (acc / jnp.maximum(wacc, 1e-8))[:h, :w]
            # wire format: values 0..2 fit in 2 bits, so four pixels ride
            # one uint8 ([h, w/4] download = 1.05 MB per 2048^2 image
            # instead of int32's 16.8 MB — the download is a first-order
            # serving cost over a remote relay).  _unpack_mask_wire
            # restores the public [h, w] uint8 mask on the host; the API
            # contract is unchanged.  Falls back to plain uint8 when w%4.
            m = convert_probs_to_mask(full).astype(jnp.uint8)
            if w % 4 == 0:
                m4 = m.reshape(h, w // 4, 4)
                m = (m4[..., 0] | (m4[..., 1] << 2)
                     | (m4[..., 2] << 4) | (m4[..., 3] << 6))
            return m

        return run

    @staticmethod
    def _unpack_mask_wire(packed: np.ndarray, w: int) -> np.ndarray:
        """Inverse of the 2-bit wire packing: [..., h, w/4] uint8 ->
        [..., h, w] uint8 (no-op when the width was not packed)."""
        if packed.shape[-1] == w:
            return packed
        out = np.empty(packed.shape[:-1] + (w,), np.uint8)
        out[..., 0::4] = packed & 3
        out[..., 1::4] = (packed >> 2) & 3
        out[..., 2::4] = (packed >> 4) & 3
        out[..., 3::4] = (packed >> 6) & 3
        return out

    def predict_semantic_masks_tiled(self, images01: np.ndarray) -> np.ndarray:
        """Batched tiled serving: [B,H,W,3] float in [0,1] -> uint8 masks
        [B,H,W], full-resolution sliding-window semantics identical to
        per-image predict_semantic_mask(tiled=True).  The whole batch is
        ONE device program (vmapped tiled body: XLA folds the image axis
        into the tile-batch axis of every conv), so per-call dispatch/RTT
        amortises over B images — the multi-image throughput path for
        uniform-size full-res serving."""
        imgs = jnp.asarray(images01, jnp.float32)
        b, h, w = int(imgs.shape[0]), int(imgs.shape[1]), int(imgs.shape[2])
        key = ("batch", b, h, w)
        prog = self._tiled_programs.get(key)
        if prog is None:
            prog = jax.jit(jax.vmap(self._tiled_run_body(h, w),
                                    in_axes=(None, None, 0)))
            self._tiled_programs[key] = prog
        return self._unpack_mask_wire(
            np.asarray(prog(
                self.state.params, self.state.batch_stats, imgs)), w)

    def predict_semantic_masks(self, images01: np.ndarray) -> np.ndarray:
        """Batched serving path: [B,H,W,3] float in [0,1] -> int masks
        [B,H,W].  Same enhance->TTA->cascade semantics as
        predict_semantic_mask, but the whole batch shares each forward —
        the throughput path for uniform-size serving (BENCH_MODE=eval)."""
        return np.asarray(
            self.batch_pipeline(
                self.state.params, self.state.batch_stats,
                jnp.asarray(images01, jnp.float32),
            )
        )

    def predict_probs_tiled(self, image01: np.ndarray) -> np.ndarray:
        """Full-resolution probabilities via sliding-window tiles with Hann
        overlap-blend stitching (ops/tiling.py semantics, but with the tile
        forward compiled ONCE — fixed tile/batch shape — so arbitrary image
        sizes share a single program; stitching is host-side numpy, trivial
        next to the forwards).  With a mesh, the tile batch is sharded over
        Mesh('data') and scales across chips."""
        from enhanced_unet_tpu.ops.tiling import _tile_positions, hann_window_2d

        tile, overlap = self.tile, self.overlap
        stride = tile - overlap
        if stride <= 0:
            raise ValueError("overlap must be smaller than tile")

        img = np.asarray(
            self._enhance(jnp.asarray(image01, jnp.float32)), np.float32
        )
        h, w = img.shape[:2]
        pad_h, pad_w = max(tile - h, 0), max(tile - w, 0)
        if pad_h or pad_w:
            img = np.pad(img, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
        ph, pw = img.shape[:2]

        positions = [
            (y, x)
            for y in _tile_positions(ph, tile, stride)
            for x in _tile_positions(pw, tile, stride)
        ]
        tiles = np.stack([img[y: y + tile, x: x + tile] for y, x in positions])
        n = len(positions)

        bs = self.tile_batch or 8
        if self.mesh is not None:
            # round the batch up to the mesh size and shard the tile axis
            bs = max(bs, self.mesh.devices.size)
            bs -= bs % self.mesh.devices.size

        n_pad = (-n) % bs
        if n_pad:
            tiles = np.concatenate(
                [tiles, np.zeros((n_pad, tile, tile, 3), np.float32)]
            )

        probs_chunks = []
        for s in range(0, len(tiles), bs):
            chunk = jnp.asarray(tiles[s: s + bs])
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                chunk = jax.device_put(
                    chunk, NamedSharding(self.mesh, P("data")))
            probs_chunks.append(
                np.asarray(
                    self._tile_fwd(
                        self.state.params, self.state.batch_stats, chunk)
                )
            )
        probs = np.concatenate(probs_chunks)[:n]

        window = hann_window_2d(tile)[..., None]
        num_classes = probs.shape[-1]
        acc = np.zeros((ph, pw, num_classes), np.float32)
        wacc = np.zeros((ph, pw, 1), np.float32)
        for i, (y, x) in enumerate(positions):
            acc[y: y + tile, x: x + tile] += probs[i] * window
            wacc[y: y + tile, x: x + tile] += window
        return (acc / np.maximum(wacc, 1e-8))[:h, :w]

    def predict_probs(self, image01: np.ndarray) -> np.ndarray:
        """Raw softmax probabilities (no enhance/TTA) for ROC/PR plots
        (train_eval.py:1291-1306)."""
        return np.asarray(
            self._probs_pipeline(
                self.state.params, self.state.batch_stats,
                jnp.asarray(image01, jnp.float32),
            )
        )

    def evaluate(self, loader) -> Dict:
        """Aggregate the full reference metric dict over a BatchLoader
        (train_eval.py:852-1021)."""
        from enhanced_unet_tpu.postprocess import semantic_to_instances

        all_metrics: Dict[str, List[float]] = {k: [] for k in _METRIC_KEYS}
        all_pred_annotations: List[Dict] = []
        all_gt_annotations: List[Dict] = []
        image_counter = 0

        for batch in loader:
            items = batch["batch_items"][: batch["n_real"]]
            # device half batched by shape group (one forward per group
            # instead of one device round-trip per image); host morphology
            # and metrics stay per-image below.  Per-image and batched
            # pipelines are pinned equal (tests/test_round2_features.py).
            preds: List[Optional[np.ndarray]] = [None] * len(items)
            if not self.tiled and len(items) > 1:
                groups: Dict[tuple, List[int]] = {}
                for idx, item in enumerate(items):
                    groups.setdefault(
                        tuple(np.asarray(item["image"]).shape), []
                    ).append(idx)
                for shape, idxs in groups.items():
                    if len(idxs) == 1:
                        continue  # single pipeline below (no batch compile)
                    imgs = np.stack([
                        np.asarray(items[j]["image"], np.float32)
                        for j in idxs
                    ])
                    for j, m in zip(idxs, self.predict_semantic_masks(imgs)):
                        preds[j] = np.asarray(m)

            for i, item in enumerate(items):
                image01 = np.asarray(item["image"], np.float32)
                gt_instance_masks = item["instance_masks"]
                gt_instance_labels = item["instance_labels"]
                gt_semantic = np.asarray(item["semantic_mask"])

                img_id = image_counter
                image_counter += 1

                pred_semantic = (preds[i] if preds[i] is not None
                                 else self.predict_semantic_mask(image01))

                for k, v in calculate_semantic_metrics(
                    pred_semantic, gt_semantic
                ).items():
                    if k in all_metrics:
                        all_metrics[k].append(v)

                pred_masks, pred_labels, pred_scores = semantic_to_instances(
                    pred_semantic
                )

                # first-3-image diagnostics (reference train_eval.py:921-937)
                if self.verbose and image_counter <= 3:
                    p_live = sum(1 for l in pred_labels if l == 0)
                    p_dead = sum(1 for l in pred_labels if l == 1)
                    g_live = sum(1 for l in gt_instance_labels if l == 0)
                    g_dead = sum(1 for l in gt_instance_labels if l == 1)
                    live_px = int((pred_semantic == 1).sum())
                    dead_px = int((pred_semantic == 2).sum())
                    print(
                        f"[debug] image {image_counter} "
                        f"({item.get('image_id', 'unknown')}): "
                        f"live_px={live_px} dead_px={dead_px} "
                        f"pred live/dead={p_live}/{p_dead} "
                        f"gt live/dead={g_live}/{g_dead}"
                    )
                    if live_px > 0 and p_live == 0:
                        print(f"  WARNING: {live_px} live pixels but no "
                              "live instances detected")
                    if dead_px > 0 and p_dead == 0:
                        print(f"  WARNING: {dead_px} dead pixels but no "
                              "dead instances detected")

                for k, v in calculate_instance_metrics(
                    pred_masks, pred_labels, pred_scores,
                    gt_instance_masks, gt_instance_labels,
                ).items():
                    if k in all_metrics:
                        all_metrics[k].append(v)

                for mask, label, score in zip(pred_masks, pred_labels, pred_scores):
                    all_pred_annotations.append(
                        {
                            "image_id": img_id,
                            "category_id": int(label),
                            "bbox": mask_to_bbox(mask),
                            "segmentation": encode_rle(mask),
                            "score": float(score),
                            "area": int(mask.sum()),
                        }
                    )
                for mask, label in zip(gt_instance_masks, gt_instance_labels):
                    all_gt_annotations.append(
                        {
                            "image_id": img_id,
                            "category_id": int(label),
                            "bbox": mask_to_bbox(mask),
                            "segmentation": encode_rle(mask),
                            "area": int(np.asarray(mask).sum()),
                            "iscrowd": 0,
                        }
                    )

                pred_live = sum(1 for l in pred_labels if l == 0)
                pred_dead = sum(1 for l in pred_labels if l == 1)
                gt_live = sum(1 for l in gt_instance_labels if l == 0)
                gt_dead = sum(1 for l in gt_instance_labels if l == 1)
                for k, v in calculate_viability_metrics(
                    pred_live, pred_dead, gt_live, gt_dead
                ).items():
                    if k in all_metrics:
                        all_metrics[k].append(v)

        if all_pred_annotations and all_gt_annotations:
            coco = calculate_coco_metrics(all_pred_annotations, all_gt_annotations)
            all_metrics["bbox_mAP"] = [coco["bbox_mAP"]]
            all_metrics["segm_mAP"] = [coco["segm_mAP"]]

        return {
            k: (float(np.mean(v)) if v else 0.0) for k, v in all_metrics.items()
        }
