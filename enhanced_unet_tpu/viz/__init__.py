"""Reporting layer: host-side matplotlib chart generators.

Parity target: reference visualization.py (Visualizer, ~25 generators).
Inputs are numpy arrays pulled from device; nothing here touches JAX.
"""

from enhanced_unet_tpu.viz.visualizer import Visualizer

__all__ = ["Visualizer"]
