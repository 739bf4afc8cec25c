"""Host dataset + loader tests (reference dataset.py parity behaviors)."""

import json
import os

import numpy as np
import pytest

from synthdata import make_synthetic_dataset

from enhanced_unet_tpu.data.dataset import CellDataset, collate_fn, snap_to_multiple
from enhanced_unet_tpu.data.loader import BatchLoader


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cells")
    make_synthetic_dataset(str(d), n_images=10, size=96)
    return str(d)


class TestSplit:
    def test_70_15_15_by_sorted_filename(self, data_dir):
        tr = CellDataset(data_dir, "train", max_size=96)
        va = CellDataset(data_dir, "val", max_size=96)
        te = CellDataset(data_dir, "test", max_size=96)
        assert len(tr) == 7 and len(va) == 1 and len(te) == 2
        all_files = sorted(tr.files + va.files + te.files)
        assert tr.files == all_files[:7]
        assert va.files == all_files[7:8]
        assert te.files == all_files[8:]

    def test_deterministic(self, data_dir):
        a = CellDataset(data_dir, "train", max_size=96).files
        b = CellDataset(data_dir, "train", max_size=96).files
        assert a == b


class TestSnap:
    def test_downscale_and_snap(self):
        # 1000x800 with max 640: scale 0.64 -> 640x512 -> /32 snap
        assert snap_to_multiple(1000, 800, 640) == (640, 512)

    def test_no_downscale_still_snaps(self):
        assert snap_to_multiple(100, 70, 640) == (96, 64)

    def test_aligned_passthrough(self):
        assert snap_to_multiple(640, 512, 640) == (640, 512)


class TestItems:
    def test_item_structure(self, data_dir):
        ds = CellDataset(data_dir, "train", max_size=96)
        item = ds[0]
        h, w = item["semantic_mask"].shape
        assert item["image"].shape == (h, w, 3)
        assert item["image"].dtype == np.float32
        assert 0.0 <= item["image"].min() and item["image"].max() <= 1.0
        assert len(item["instance_masks"]) == len(item["instance_labels"])
        assert set(item["instance_labels"]) <= {0, 1}
        assert set(np.unique(item["semantic_mask"])) <= {0, 1, 2}
        # semantic mask consistent with instances
        union = np.zeros((h, w), bool)
        for m in item["instance_masks"]:
            union |= m > 0
        np.testing.assert_array_equal(item["semantic_mask"] > 0, union)

    def test_coco_format(self, data_dir):
        ds = CellDataset(data_dir, "train", max_size=96)
        coco = ds.get_coco_format(0)
        from enhanced_unet_tpu.data.rle import decode_rle

        for ann in coco["annotations"]:
            assert ann["category_id"] in (0, 1)
            m = decode_rle(ann["segmentation"])
            assert int(m.sum()) == ann["area"]


class TestCollateAndLoader:
    def test_collate_pads_to_static_shape(self, data_dir):
        ds = CellDataset(data_dir, "train", max_size=96)
        batch = collate_fn([ds[0], ds[1]], pad_shape=(128, 128))
        assert batch["images"].shape == (2, 128, 128, 3)
        assert batch["semantic_masks"].shape == (2, 128, 128)
        assert batch["valid_mask"][:, :96, :96].all()
        assert not batch["valid_mask"][:, 96:, :].any()

    def test_loader_epoch_shapes(self, data_dir):
        ds = CellDataset(data_dir, "train", max_size=96)
        loader = BatchLoader(ds, 3, (96, 96), train=False, preprocess=False)
        batches = list(loader)
        assert len(batches) == len(loader) == 3
        for b in batches:
            assert b["images"].shape == (3, 96, 96, 3)
        # last batch padded with zeros beyond n_real
        assert batches[-1]["n_real"] == 1

    def test_loader_shuffles_between_epochs(self, data_dir):
        ds = CellDataset(data_dir, "train", max_size=96)
        loader = BatchLoader(ds, 7, (96, 96), train=True, seed=1)
        ids1 = [it["image_id"] for b in loader for it in b["batch_items"]]
        ids2 = [it["image_id"] for b in loader for it in b["batch_items"]]
        assert sorted(ids1) == sorted(ids2)
        assert ids1 != ids2  # extremely unlikely identical shuffle
