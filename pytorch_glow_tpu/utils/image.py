"""Image grid / PNG helpers (reference: tensor<->PIL conversions in
upstream:misc/util.py and the Trainer's sample/reconstruction grids;
SURVEY.md §2.1 #6, #19)."""

from __future__ import annotations

import math
import os

import numpy as np


def make_grid(images: np.ndarray, ncol: int | None = None, pad: int = 2) -> np.ndarray:
    """(N, H, W, C) uint8 -> one (GH, GW, C) uint8 grid image."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    ncol = ncol or int(math.ceil(math.sqrt(n)))
    nrow = int(math.ceil(n / ncol))
    grid = np.zeros(
        (nrow * (h + pad) + pad, ncol * (w + pad) + pad, c), dtype=np.uint8
    )
    for i in range(n):
        r, col = divmod(i, ncol)
        y0 = pad + r * (h + pad)
        x0 = pad + col * (w + pad)
        grid[y0 : y0 + h, x0 : x0 + w] = images[i]
    return grid


def save_png(path: str, image: np.ndarray) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    from PIL import Image

    Image.fromarray(np.asarray(image)).save(path)


def save_image_grid(path: str, images: np.ndarray, ncol: int | None = None) -> None:
    save_png(path, make_grid(images, ncol))
