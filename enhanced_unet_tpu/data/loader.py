"""Batch loader: host decode -> fixed-shape batches -> on-device
preprocessing + augmentation.

The reference's DataLoader does all feature engineering per-image on the
CPU inside __getitem__ (dataset.py:133-321, num_workers=0 — the documented
input bottleneck).  Here the host only decodes and rasterizes; CLAHE /
edge features / augmentation run batched on the accelerator
(ops.preprocess / ops.augment), overlapping with the train step.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from enhanced_unet_tpu.data.dataset import CellDataset
from enhanced_unet_tpu.ops.augment import augment_train
from enhanced_unet_tpu.ops.preprocess import cell_specific_preprocess, eval_preprocess


@jax.jit
def _train_device_pipeline(keys, images_u8, live, dead, masks):
    """Batched feature engineering + augmentation; returns images in [0,1]."""

    def per_sample(key, img, lv, dd, mask):
        img = cell_specific_preprocess(img, lv, dd)
        img, mask = augment_train(key, img, mask)
        return img / 255.0, mask

    return jax.vmap(per_sample)(keys, images_u8, live, dead, masks)


@jax.jit
def _eval_device_pipeline(images_u8):
    return jax.vmap(eval_preprocess)(images_u8) / 255.0


def _class_union(item, label: int) -> np.ndarray:
    """Union of instance masks for one class (reference np.maximum loop,
    dataset.py:96-100)."""
    h, w = item["semantic_mask"].shape
    out = np.zeros((h, w), np.uint8)
    for m, l in zip(item["instance_masks"], item["instance_labels"]):
        if l == label:
            out = np.maximum(out, m)
    return out


class BatchLoader:
    """Fixed-shape batches over a CellDataset.

    pad_shape fixes the static XLA shape; images smaller than it are
    zero-padded and tracked in `valid`.  Train mode applies the
    GT-conditioned preprocess + stochastic augmentation on-device.

    NOTE: train-time on-device preprocessing sees the padded image, so for
    datasets with mixed sizes the CLAHE tile histograms include the zero
    padding (the reference preprocesses each image at native size).  With
    the standard /32-snapped uniform max_size pipeline no padding exists
    and the two agree; mixed-size datasets trade this shift for a single
    compiled program.  EVAL loaders enhance at native size before padding
    (batched per same-shape group), so eval preprocessing matches the
    reference's per-image preprocess exactly at any batch size.
    """

    def __init__(
        self,
        dataset: CellDataset,
        batch_size: int,
        pad_shape: Tuple[int, int],
        train: bool = False,
        shuffle: Optional[bool] = None,
        seed: int = 0,
        drop_remainder: bool = False,
        preprocess: bool = True,
        prefetch: int = 2,
        process_shard: Optional[Tuple[int, int]] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.pad_shape = pad_shape
        self.train = train
        self.shuffle = train if shuffle is None else shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.preprocess = preprocess
        # multi-host: (process_index, process_count).  Each process iterates
        # a disjoint stride-slice of the (identically seeded) epoch order,
        # truncated so every process yields the SAME number of batches —
        # required for the collective train step to stay in lockstep.
        # batch_size is then PER PROCESS (global = batch_size * count).
        self.process_shard = process_shard
        # background-thread prefetch depth: host decode of batch k+1 overlaps
        # the device step on batch k (JAX dispatch is async, so the produced
        # batches already have their device pipeline enqueued).  0 disables.
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.process_shard is not None:
            n = n // self.process_shard[1]
        if self.drop_remainder:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict]:
        if self.prefetch <= 0:
            yield from self._make_batches()
            return

        # double-buffered producer thread: decodes/rasterizes batch k+1 and
        # enqueues its device pipeline while the consumer trains on batch k
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        sentinel = object()
        errors: List[BaseException] = []

        def producer():
            try:
                for b in self._make_batches():
                    while not stop.is_set():
                        try:
                            q.put(b, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # surfaced on the consumer side
                errors.append(e)
            finally:
                # keep trying until delivered or the consumer signals stop —
                # a dropped sentinel would deadlock the consumer's q.get()
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is sentinel:
                    break
                yield b
        finally:
            stop.set()
            t.join(timeout=5.0)
        if errors:
            raise errors[0]

    def _make_batches(self) -> Iterator[Dict]:
        n = len(self.dataset)
        order = np.arange(n)
        rank = 0
        if self.shuffle:
            # seeded identically on every process so the per-epoch order
            # (and hence the disjoint process shards) agree globally
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        if self.process_shard is not None:
            rank, world = self.process_shard
            order = order[: n // world * world][rank::world]
            n = len(order)
        self._epoch += 1
        ph, pw = self.pad_shape

        for start in range(0, n, self.batch_size):
            idxs = order[start : start + self.batch_size]
            if self.drop_remainder and len(idxs) < self.batch_size:
                break
            items = [self.dataset[int(i)] for i in idxs]
            bs = self.batch_size
            images = np.zeros((bs, ph, pw, 3), np.float32)
            masks = np.zeros((bs, ph, pw), np.int32)
            valid = np.zeros((bs, ph, pw), bool)
            live = np.zeros((bs, ph, pw), np.uint8)
            dead = np.zeros((bs, ph, pw), np.uint8)
            for j, item in enumerate(items):
                h, w = item["semantic_mask"].shape
                images[j, :h, :w] = item["image_u8"]
                masks[j, :h, :w] = item["semantic_mask"]
                valid[j, :h, :w] = True
                if self.train and self.preprocess:
                    live[j, :h, :w] = _class_union(item, 0)
                    dead[j, :h, :w] = _class_union(item, 1)

            if self.train and self.preprocess:
                keys = jax.random.split(
                    # rank decorrelates augmentation noise across processes
                    jax.random.key(
                        hash((self.seed, self._epoch, start, rank)) & 0x7FFFFFFF
                    ),
                    bs,
                )
                imgs_d, masks_d = _train_device_pipeline(
                    keys,
                    jnp.asarray(images),
                    jnp.asarray(live),
                    jnp.asarray(dead),
                    jnp.asarray(masks),
                )
            elif self.preprocess:
                # eval: enhance at NATIVE size (the reference's per-image
                # preprocess, train_eval.py:380-392) so CLAHE tile
                # histograms never see the zero padding — batched per
                # same-shape group; one compile per distinct (group size,
                # image shape) (val sets share one snapped shape)
                imgs_np = np.zeros((bs, ph, pw, 3), np.float32)
                groups: Dict[Tuple[int, int], List[int]] = {}
                for j, item in enumerate(items):
                    groups.setdefault(
                        tuple(item["semantic_mask"].shape), []
                    ).append(j)
                for (h, w), idxs in groups.items():
                    native = np.asarray(_eval_device_pipeline(jnp.asarray(
                        np.stack([items[j]["image_u8"] for j in idxs]),
                        jnp.float32,
                    )))
                    for k, j in enumerate(idxs):
                        imgs_np[j, :h, :w] = native[k]
                imgs_d = jnp.asarray(imgs_np)
                masks_d = jnp.asarray(masks)
            else:
                imgs_d = jnp.asarray(images) / 255.0
                masks_d = jnp.asarray(masks)

            yield {
                "images": imgs_d,
                "semantic_masks": masks_d,
                "valid_mask": jnp.asarray(valid),
                "batch_items": items,
                "n_real": len(items),
            }
