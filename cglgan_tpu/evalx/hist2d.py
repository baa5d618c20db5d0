"""2DMG evaluation: KL Score and Distribution Score.

Reference painter (ACGAN/2DMG/acgan.py:56-99, CGLGAN/2DMG/main.py:63-101):
16-bin (32 for MD-GAN) 2-D histograms of real and generated samples on
[-1,1]^2; KL Score = scipy entropy(g_hist, r_hist) restricted to cells where
the real histogram is non-zero; Distribution Score = fraction of generated
mass falling inside real-support cells (mode coverage).

Jitted, fully on-device: the histogram is a one-hot scatter via bucketised
integer cells + segment-sum — no host round-trip per eval tick.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("bins",))
def hist2d(pts, bins: int = 16):
    """Counts on a bins x bins grid over [-1,1]^2; matches numpy.histogram2d
    with range [[-1,1],[-1,1]] (right-inclusive last edge, out-of-range
    dropped)."""
    x, y = pts[:, 0], pts[:, 1]
    fx = (x + 1.0) * (bins / 2.0)
    fy = (y + 1.0) * (bins / 2.0)
    ix = jnp.clip(jnp.floor(fx), 0, bins - 1).astype(jnp.int32)
    iy = jnp.clip(jnp.floor(fy), 0, bins - 1).astype(jnp.int32)
    valid = (fx >= 0) & (fx <= bins) & (fy >= 0) & (fy <= bins)
    cell = ix * bins + iy
    counts = jax.ops.segment_sum(valid.astype(jnp.float32), cell,
                                 num_segments=bins * bins)
    return counts.reshape(bins, bins)


@partial(jax.jit, static_argnames=("bins",))
def kl_and_distribution_score(generated, real, bins: int = 16):
    """Returns (kl_score, distribution_score).

    kl: entropy(g[support], r[support]) where support = cells with real mass —
    scipy normalises both histograms over the selected cells
    (acgan.py:80-87).  ds: sum(g[support]) / len(generated) (acgan.py:88)."""
    cg = hist2d(generated, bins)
    cr = hist2d(real, bins)
    support = cr > 0
    g = jnp.where(support, cg, 0.0)
    r = jnp.where(support, cr, 0.0)
    gn = g / jnp.maximum(g.sum(), 1e-12)
    rn = r / jnp.maximum(r.sum(), 1e-12)
    kl = jnp.sum(jnp.where(gn > 0, gn * jnp.log(gn / jnp.maximum(rn, 1e-12)),
                           0.0))
    ds = g.sum() / generated.shape[0]
    return kl, ds


@partial(jax.jit, static_argnames=("bins",))
def mode_coverage(generated, real, bins: int = 16):
    """Fraction of real-support cells hit by any generated sample — the
    commented "cs" metric (acgan.py:89)."""
    cg = hist2d(generated, bins)
    cr = hist2d(real, bins)
    support = cr > 0
    hit = (cg > 0) & support
    return hit.sum() / jnp.maximum(support.sum(), 1)
