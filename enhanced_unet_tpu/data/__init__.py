"""Data layer: host-side dataset/loader + COCO RLE codec.

On-device preprocessing/augmentation live in enhanced_unet_tpu.ops; this
package handles decode, annotation parsing, deterministic splits and
fixed-shape batching.
"""

from enhanced_unet_tpu.data.rle import (
    encode_rle,
    decode_rle,
    rle_to_string,
    rle_from_string,
    rle_area,
    rle_to_bbox,
    mask_to_bbox,
)
from enhanced_unet_tpu.data.dataset import CellDataset, collate_fn
from enhanced_unet_tpu.data.loader import BatchLoader

__all__ = [
    "BatchLoader",
    "encode_rle",
    "decode_rle",
    "rle_to_string",
    "rle_from_string",
    "rle_area",
    "rle_to_bbox",
    "mask_to_bbox",
    "CellDataset",
    "collate_fn",
]
