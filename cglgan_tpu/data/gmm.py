"""Synthetic 2-D Gaussian-Mixture dataset ("2DMG").

Capability parity with the reference ``gmm`` class (CGLGAN/2DMG/data.py:5-38
and its byte-identical copies in ACGAN/FLGAN/MDGAN): ``n_class`` modes spaced
on the unit circle (radius 1, std 0.01), ``x`` samples per class on average,
returned label-sorted.

TPU-first rewrite: the reference draws the 50 000 samples in a Python loop of
one-sample ``torch.normal`` calls (data.py:33-36); here the whole dataset is
one vectorised ``jax.random`` draw — O(1) dispatches instead of O(n).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def gmm_modes(n_class: int, radius: float = 1.0) -> np.ndarray:
    """Mode centres: theta_i = linspace(0, 2*pi*(1-1/n), n) with
    (x, y) = (r*sin, r*cos) exactly as the reference (data.py:28-29)."""
    thetas = np.linspace(0.0, 2.0 * (1.0 - 1.0 / n_class) * np.pi, n_class)
    return np.stack([radius * np.sin(thetas), radius * np.cos(thetas)], axis=1)


def gmm_dataset(n_class: int = 5,
                samples_per_class: int = 10000,
                std: float = 0.01,
                seed: int = 20211212,
                dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """Returns ``(data, labels)`` label-sorted, shapes ((n*x, 2), (n*x,)).

    Mode assignment is uniform-random per sample (reference draws
    ``np.random.randint(0, n_mixture)`` per sample then sorts by label,
    data.py:33-37), so per-class counts are multinomial, not exactly equal —
    preserved here.
    """
    n = n_class * samples_per_class
    key = jax.random.key(seed)
    k_mode, k_noise = jax.random.split(key)
    labels = jax.random.randint(k_mode, (n,), 0, n_class)
    centres = jnp.asarray(gmm_modes(n_class), dtype=dtype)
    noise = std * jax.random.normal(k_noise, (n, 2), dtype=dtype)
    data = centres[labels] + noise
    order = jnp.argsort(labels, stable=True)
    return data[order], labels[order].astype(jnp.int32)
