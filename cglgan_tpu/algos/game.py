"""The Lambda minimax-game weighting formulas of the CGL/CAP/Mix family.

Each variant turns the per-client generator-loss vector ``l`` (computed by
the clients' discriminators) into (a) a constant weight vector ``w`` defining
the trunk/generator objective ``F = sum(w * l) [- 0.001*Lambda]`` and (b) an
update for the game variable Lambda.  Pure functions of (l, beta, Lambda) —
unit-tested against hand-derived values.

Reference formulas:
* ``cgl_mean_game`` — gamma = softmax(Lambda*l); F = (beta.l + gamma.l)/2;
  manual ascent Lambda += 10 * [sum(l^2 gamma) - sum(l gamma) * F_gamma]
  (CGLGAN/MNIST/main.py:279-292).
* ``cap_exp`` — alpha = softmax(softmax(Lambda*l) * beta);
  F = alpha.l - 0.001*Lambda; Lambda updated by SGD(lr=0.1) on F, whose
  Lambda-gradient is the constant -0.001 (capgan.py:247-259 — both softmax
  arguments are detached, so nothing else reaches Lambda).
* ``mix_bll`` — alpha = softmax(beta * Lambda * l); F = alpha.l - 0.001*Lambda;
  same SGD Lambda step (mixed-gan.py:276-286).
* ``beta_gamma`` — gamma = softmax(Lambda*l); s = softmax(beta*gamma);
  F = s.l - 0.001*Lambda (CAPGAN/MNIST/capgan.py:241-243).
* ``beta`` / ``gamma`` / ``mean`` — the reference's commented alternatives
  (capgan.py:237-256), selectable for ablation.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GameOut(NamedTuple):
    w: jax.Array          # constant per-client weights for the G objective
    lam_new: jax.Array    # updated Lambda
    f_beta: jax.Array     # diagnostics (0 where not defined by the variant)
    f_gamma: jax.Array
    lam_coeff: jax.Array  # coefficient of -Lambda in F (0.0 or 0.001)


def game_step(mode: str, l, beta, lam, lr_lambda: float = 0.1) -> GameOut:
    """All inputs detached; ``l`` shape (N,), ``beta`` shape (N,) summing to 1."""
    l = jax.lax.stop_gradient(l)
    beta = jnp.asarray(beta, l.dtype)
    zero = jnp.zeros((), l.dtype)

    if mode == "cgl_mean_game":
        gamma = jax.nn.softmax(lam * l)
        f_beta = jnp.sum(beta * l)
        f_gamma = jnp.sum(gamma * l)
        w = (beta + gamma) / 2.0
        grad = jnp.sum(l * l * gamma) - jnp.sum(l * gamma) * f_gamma
        return GameOut(w, lam + 10.0 * grad, f_beta, f_gamma, zero)

    if mode == "cap_exp":
        inner = jax.nn.softmax(lam * l)
        w = jax.nn.softmax(inner * beta)
        lam_new = lam + lr_lambda * 0.001   # SGD minimising -0.001*Lambda
        return GameOut(w, lam_new, jnp.sum(beta * l), jnp.sum(inner * l),
                       jnp.asarray(0.001, l.dtype))

    if mode == "mix_bll":
        w = jax.nn.softmax(beta * lam * l)
        lam_new = lam + lr_lambda * 0.001
        return GameOut(w, lam_new, jnp.sum(beta * l), zero,
                       jnp.asarray(0.001, l.dtype))

    if mode == "beta_gamma":
        gamma = jax.nn.softmax(lam * l)
        w = jax.nn.softmax(beta * gamma)
        lam_new = lam + lr_lambda * 0.001
        return GameOut(w, lam_new, jnp.sum(beta * l), jnp.sum(gamma * l),
                       jnp.asarray(0.001, l.dtype))

    if mode == "beta":
        return GameOut(beta, lam, jnp.sum(beta * l), zero, zero)

    if mode == "gamma":
        gamma = jax.nn.softmax(lam * l)
        lam_new = lam + lr_lambda * 0.001
        return GameOut(gamma, lam_new, zero, jnp.sum(gamma * l),
                       jnp.asarray(0.001, l.dtype))

    if mode == "mean":
        # F = sum(l): "average when num_server = 1 this equal MDGAN"
        # (capgan.py:237-238)
        return GameOut(jnp.ones_like(l), lam, zero, zero, zero)

    raise ValueError(f"unknown weighting mode {mode!r}")
