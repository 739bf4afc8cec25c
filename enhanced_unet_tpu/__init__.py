"""Enhanced-UNet TPU: a TPU-native framework for label-free cell-viability
assessment from bright-field microscopy.

Re-designed from scratch for TPU (JAX / Flax / Pallas / shard_map) with the
capabilities of the PyTorch reference `whh1747012859/Enhanced-UNet`:

- model zoo: segnet / unet / enhanced_unet / fcn / pspnet / linknet
  (reference: models.py:590-624)
- combined Focal+Dice+Tversky training with deep supervision
  (reference: train_eval.py:66-234)
- on-device preprocessing (CLAHE / Sobel / unsharp) and stateless-PRNG
  augmentation (reference: dataset.py:58-300)
- TTA + heuristic thresholding + instance extraction eval pipeline
  (reference: train_eval.py:356-1021)
- semantic / instance / COCO-mAP / viability metrics
  (reference: metrics.py)
- sliding-window tiled full-resolution inference (TPU "long-context" path)
- shard_map data-parallel training over a jax.sharding.Mesh
"""

__version__ = "0.1.0"

from enhanced_unet_tpu.config import ModelConfig, TrainConfig, get_preset

__all__ = ["ModelConfig", "TrainConfig", "get_preset", "__version__"]
