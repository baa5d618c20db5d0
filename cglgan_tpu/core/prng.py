"""PRNG discipline.

The reference seeds one global ``Random(20211212)`` plus per-thread
``Random(rank)`` generators (capgan.py:26-29, ACGAN/2DMG/acgan.py:116-117) and
relies on thread scheduling for the rest — runs are only approximately
reproducible.  Here every random draw derives from a single root key via
``jax.random.fold_in`` with stable role/round/client tags, so a run is exactly
reproducible regardless of device count or compilation layout.
"""
from __future__ import annotations

import jax

# Stable role tags folded into the key so that streams never collide.
ROLE_DATA = 0        # dataset synthesis / partition shuffles
ROLE_INIT_G = 1      # generator init
ROLE_INIT_D = 2      # discriminator init
ROLE_NOISE_D = 3     # latent noise for the D-training fake batch (Xd)
ROLE_NOISE_G = 4     # latent noise for the G-loss batch (Xg)
ROLE_BATCH = 5       # real-data minibatch sampling
ROLE_EVAL = 6        # fixed_z evaluation noise
ROLE_LOCAL = 7       # local-loop noise (FL-GAN/FeGAN worker G steps)
ROLE_SWAP = 8        # MD-GAN D-swap shuffle permutation


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def for_role(key: jax.Array, role: int) -> jax.Array:
    return jax.random.fold_in(key, role)


def for_round(key: jax.Array, t) -> jax.Array:
    """Fold the round counter in; `t` may be a traced int32 inside scan."""
    return jax.random.fold_in(key, t)


def for_member(key: jax.Array, idx) -> jax.Array:
    """Fold in a server/client index (traced or static)."""
    return jax.random.fold_in(key, idx)
