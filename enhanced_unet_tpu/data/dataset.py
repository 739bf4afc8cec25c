"""Host-side dataset: decode, labelme-polygon parsing, deterministic split.

Parity target: reference dataset.py:21-362 (CellDataset / collate_fn).
Responsibilities are split TPU-first:

- THIS module (host): list *.jpg, 70/15/15 split by sorted filename, decode,
  resize with /32 snapping, rasterize labelme polygons to instance masks +
  semantic mask, fixed-shape batching.
- enhanced_unet_tpu.ops.preprocess (device): CLAHE / Sobel / unsharp feature
  engineering (reference dataset.py:58-131) as fusable jnp ops.
- enhanced_unet_tpu.ops.augment (device): the 8-stage stochastic
  augmentation pipeline (reference dataset.py:207-300) with jax.random.

Unlike the reference's per-image dynamic shapes, train batches are padded to
one static shape so XLA compiles the train step once.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2  # host-side decode/rasterize only; the compute path is JAX

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False

from PIL import Image


def _fill_polygon(mask: np.ndarray, points: np.ndarray) -> None:
    """Rasterize one polygon into `mask` (cv2.fillPoly semantics)."""
    if _HAS_CV2:
        cv2.fillPoly(mask, [points.astype(np.int32)], 1)
        return
    # numpy fallback: even-odd scanline fill
    h, w = mask.shape
    pts = points.astype(np.float64)
    ys = np.arange(h) + 0.0
    x0, y0 = pts[:, 0], pts[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    for yi, y in enumerate(ys):
        cond = (y0 <= y) != (y1 <= y)
        if not cond.any():
            continue
        xs = x0[cond] + (y - y0[cond]) * (x1[cond] - x0[cond]) / (y1[cond] - y0[cond])
        xs = np.sort(xs)
        for a, b in zip(xs[0::2], xs[1::2]):
            lo, hi = int(np.ceil(a)), int(np.floor(b))
            mask[yi, max(lo, 0) : min(hi + 1, w)] = 1


def _resize_image(image: np.ndarray, size_wh: Tuple[int, int]) -> np.ndarray:
    if _HAS_CV2:
        return cv2.resize(image, size_wh, interpolation=cv2.INTER_LINEAR)
    return np.asarray(
        Image.fromarray(image).resize(size_wh, Image.BILINEAR)
    )


def snap_to_multiple(h: int, w: int, max_size: int, multiple: int = 32) -> Tuple[int, int]:
    """Reference resize policy (dataset.py:143-158): scale so max side <=
    max_size, then floor-snap both sides to /32."""
    if max(h, w) > max_size:
        scale = max_size / max(h, w)
        h, w = int(h * scale), int(w * scale)
    return (h // multiple) * multiple, (w // multiple) * multiple


class CellDataset:
    """Bright-field microscopy cell dataset with labelme-style JSON polygons.

    API parity with reference dataset.py:21-321: items expose image (float32
    HWC in [0,1]), instance_masks, instance_labels (0=live, 1=dead), bboxes,
    semantic_mask (0 bg / 1 live / 2 dead), image_id, original_size.

    The train-time feature engineering / augmentation of the reference is NOT
    applied here — it runs on-device (see module docstring).  Callers that
    want the full reference-equivalent sample should compose with
    ops.preprocess / ops.augment.
    """

    def __init__(
        self,
        data_dir: str,
        split: str = "train",
        max_size: int = 1024,
        files: Optional[Sequence[str]] = None,
    ):
        self.data_dir = data_dir
        self.split = split
        self.max_size = max_size

        if files is not None:
            self.files = list(files)
        else:
            all_files = sorted(
                f for f in os.listdir(data_dir) if f.endswith(".jpg")
            )
            # deterministic 70/15/15 split by sorted filename
            # (dataset.py:41-51)
            n_total = len(all_files)
            n_train = int(n_total * 0.7)
            n_val = int(n_total * 0.15)
            if split == "train":
                self.files = all_files[:n_train]
            elif split == "val":
                self.files = all_files[n_train : n_train + n_val]
            else:
                self.files = all_files[n_train + n_val :]

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> Dict:
        img_name = self.files[idx]
        img_path = os.path.join(self.data_dir, img_name)
        json_path = os.path.join(self.data_dir, img_name.replace(".jpg", ".json"))

        image = np.array(Image.open(img_path).convert("RGB"))
        original_size = image.shape[:2]

        h, w = snap_to_multiple(*original_size, self.max_size)
        if (h, w) != original_size:
            image = _resize_image(image, (w, h))

        annotations = {}
        if os.path.exists(json_path):
            with open(json_path, "r", encoding="utf-8") as f:
                annotations = json.load(f)

        scale_h = h / original_size[0]
        scale_w = w / original_size[1]

        instance_masks: List[np.ndarray] = []
        instance_labels: List[int] = []
        bboxes: List[List[int]] = []

        for shape in annotations.get("shapes", []):
            label = shape["label"].lower()
            if label not in ("live", "dead"):
                continue
            points = np.asarray(shape["points"], dtype=np.float32)
            points[:, 0] *= scale_w
            points[:, 1] *= scale_h
            points = points.astype(np.int32)

            mask = np.zeros((h, w), dtype=np.uint8)
            _fill_polygon(mask, points)

            x_min, y_min = points.min(axis=0)
            x_max, y_max = points.max(axis=0)
            instance_masks.append(mask)
            instance_labels.append(0 if label == "live" else 1)
            bboxes.append([int(x_min), int(y_min), int(x_max), int(y_max)])

        semantic_mask = np.zeros((h, w), dtype=np.int32)
        for mask, label in zip(instance_masks, instance_labels):
            semantic_mask[mask > 0] = label + 1

        return {
            "image": image.astype(np.float32) / 255.0,
            "image_u8": image,
            "instance_masks": instance_masks,
            "instance_labels": instance_labels,
            "bboxes": bboxes,
            "semantic_mask": semantic_mask,
            "image_id": img_name,
            "original_size": original_size,
        }

    def get_coco_format(self, idx: int) -> Dict:
        """COCO-format annotations for one item (reference dataset.py:323-352)."""
        from enhanced_unet_tpu.data.rle import encode_rle

        item = self.__getitem__(idx)
        coco_annotations = []
        for i, (mask, label, bbox) in enumerate(
            zip(item["instance_masks"], item["instance_labels"], item["bboxes"])
        ):
            rle = encode_rle(mask)
            coco_annotations.append(
                {
                    "id": i,
                    "category_id": label,
                    "bbox": bbox,
                    "segmentation": rle,
                    "area": int(mask.sum()),
                    "iscrowd": 0,
                }
            )
        return {
            "image": item["image"],
            "annotations": coco_annotations,
            "image_id": item["image_id"],
            "original_size": item["original_size"],
        }


def collate_fn(batch: List[Dict], pad_shape: Optional[Tuple[int, int]] = None) -> Dict:
    """Fixed-shape batching.

    The reference's collate (dataset.py:355-362) stacks same-shaped images and
    carries ragged per-item dicts.  XLA needs static shapes, so images and
    semantic masks are zero-padded to `pad_shape` (or the batch max, snapped
    up to /32); ragged instance lists stay host-side in `batch_items`.
    A `valid_mask` records real pixels so padded regions can be excluded from
    loss/metrics.
    """
    if pad_shape is None:
        max_h = max(item["image"].shape[0] for item in batch)
        max_w = max(item["image"].shape[1] for item in batch)
        pad_shape = (-(-max_h // 32) * 32, -(-max_w // 32) * 32)
    ph, pw = pad_shape

    images = np.zeros((len(batch), ph, pw, 3), dtype=np.float32)
    masks = np.zeros((len(batch), ph, pw), dtype=np.int32)
    valid = np.zeros((len(batch), ph, pw), dtype=bool)
    for i, item in enumerate(batch):
        h, w = item["image"].shape[:2]
        images[i, :h, :w] = item["image"]
        masks[i, :h, :w] = item["semantic_mask"]
        valid[i, :h, :w] = True

    return {
        "images": images,
        "semantic_masks": masks,
        "valid_mask": valid,
        "batch_items": batch,
    }
