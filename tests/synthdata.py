"""Synthetic labelme-style cell dataset for end-to-end tests.

Generates small JPGs of dark elliptical blobs on a bright-field-like
background, with `shapes: [{label: live|dead, points: [...]}]` JSON
annotations matching the reference's input format (dataset.py:161-195).
"""

import json
import os

import numpy as np
from PIL import Image


def make_synthetic_dataset(out_dir, n_images=4, size=96, cells_per_image=5, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n_images):
        h = w = size
        yy, xx = np.mgrid[:h, :w]
        img = 170 + 20 * np.sin(yy / 17.0) + rng.normal(0, 6, (h, w))
        img = np.stack([img] * 3, axis=-1)
        shapes = []
        for _ in range(cells_per_image):
            cy = rng.integers(12, h - 12)
            cx = rng.integers(12, w - 12)
            r = rng.integers(4, 9)
            label = "live" if rng.random() > 0.4 else "dead"
            # polygon approximating a circle
            theta = np.linspace(0, 2 * np.pi, 12, endpoint=False)
            pts = np.stack(
                [cx + r * np.cos(theta), cy + r * np.sin(theta)], axis=1
            )
            shapes.append({"label": label, "points": pts.tolist()})
            dist = (yy - cy) ** 2 + (xx - cx) ** 2
            shade = 90 if label == "dead" else 130
            img[dist <= r * r] = shade + rng.normal(0, 4)
        img = np.clip(img, 0, 255).astype(np.uint8)
        name = f"cell_{i:03d}.jpg"
        Image.fromarray(img).save(os.path.join(out_dir, name), quality=95)
        with open(os.path.join(out_dir, name.replace(".jpg", ".json")), "w") as f:
            json.dump({"shapes": shapes, "imageHeight": h, "imageWidth": w}, f)
    return out_dir
