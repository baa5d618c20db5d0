"""Image artifacts: sample grids and 2DMG scatter plots.

Parity with the reference painters: 10x10 ``save_image`` grids every eval
tick on MNIST (ACGAN/MNIST/acgan.py:64-73, capgan.py:83), per-device
distribution previews at startup (CGLGAN/MNIST/main.py:499-501,
ACGAN/2DMG/acgan.py:344-349) and real-vs-generated scatter plots on 2DMG
(ACGAN/2DMG/acgan.py:67-75).
"""
from __future__ import annotations

import numpy as np


def save_image_grid(images: np.ndarray, path: str, nrow: int = 10,
                    normalize: bool = True) -> None:
    """images: (N, 1, H, W) or (N, H, W) in [-1, 1] (normalize=True) or
    [0, 1].  Writes an nrow-wide PNG grid (torchvision save_image parity)."""
    from PIL import Image

    x = np.asarray(images, np.float32)
    if x.ndim == 4:
        x = x[:, 0]
    if normalize:
        lo, hi = x.min(), x.max()
        x = (x - lo) / max(hi - lo, 1e-8)
    n, h, w = x.shape
    rows = -(-n // nrow)
    pad = 2
    canvas = np.zeros((rows * (h + pad) + pad, nrow * (w + pad) + pad),
                      np.float32)
    for i in range(n):
        r, c = divmod(i, nrow)
        canvas[pad + r * (h + pad):pad + r * (h + pad) + h,
               pad + c * (w + pad):pad + c * (w + pad) + w] = x[i]
    Image.fromarray((canvas * 255).astype(np.uint8), "L").save(path)


def save_scatter_2d(path: str, real: np.ndarray,
                    generated: np.ndarray = None) -> None:
    """Real (faint) vs generated (solid) scatter on [-1.1, 1.1]^2."""
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 5))
    ax.set_xlim(-1.1, 1.1)
    ax.set_ylim(-1.1, 1.1)
    real = np.asarray(real)
    ax.scatter(real[:, 0], real[:, 1], s=1, alpha=0.2)
    if generated is not None:
        generated = np.asarray(generated)
        ax.scatter(generated[:, 0], generated[:, 1], s=0.5, alpha=0.8)
    fig.savefig(path, dpi=110)
    plt.close(fig)
