"""Training layer: optax optimizer/schedule, jitted train/eval steps,
checkpointing, orchestration (train_model / evaluate_model parity API)."""

from enhanced_unet_tpu.train.schedule import reference_lr_schedule, make_lr_fn

__all__ = ["reference_lr_schedule", "make_lr_fn"]
