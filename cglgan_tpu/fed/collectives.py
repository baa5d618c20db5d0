"""The communication backend: federation as array ops and XLA collectives.

The reference's "network" is in-process ``queue.Queue`` channels carrying
state-dict clones, serialized vectors, or live autograd tensors
(SURVEY.md §2.3; ACGAN/2DMG/acgan.py:114-120).  Here every federated exchange
is an operation on *stacked* parameter pytrees whose leading axis is the
clients (or servers) axis:

* FedAvg (FL-GAN FLGAN/MNIST/flgan.py:143-163, FeGAN fegan.py:163-164,
  cloud trunk sync CGLGAN/MNIST/main.py:100-112)  -> (weighted) mean over the
  leading axis.
* MD-GAN D-swap, left commented in the reference (MDGAN/MNIST/mdgan.py:158-164,
  258-262) -> implemented for real as a roll (ppermute) over the clients axis.
* AC-GAN every-E-rounds neighbour D-share, also commented in the reference
  (ACGAN/MNIST/acgan.py:240-263) -> neighbourhood mean.

When the stacked axis is sharded over a ``Mesh``, XLA lowers the mean to an
``all-reduce`` and the roll to a ``collective-permute`` over ICI — the
single-chip and multi-chip programs are the same code.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_avg_tree(stacked, weights):
    """Weighted average over the leading axis of every leaf.

    ``weights`` shape (N,); need not sum to 1 (callers normalise — the
    reference's ``Aggregators.fedavg_aggregate`` expects normalised weights,
    fegan.py:163-164)."""
    w = jnp.asarray(weights)

    def avg(x):
        wt = w.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
        return jnp.sum(x * wt, axis=0)

    return jax.tree.map(avg, stacked)


def fedavg_tree(stacked):
    """Uniform FedAvg over the leading axis (FL-GAN server running mean,
    FLGAN/MNIST/flgan.py:148-162)."""
    return jax.tree.map(lambda x: jnp.mean(x, axis=0), stacked)


def broadcast_tree(tree, n: int):
    """Replicate an unstacked tree to a leading axis of size n (the server
    'put p_g to every worker' fan-out, FLGAN/MNIST/flgan.py:145-147)."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n,) + x.shape), tree)


def sigma_mix(self_tree, avg_tree, segema: float):
    """sigma-mixing after a cloud sync: sigma*self + (1-sigma)*average
    (CGLGAN/MNIST/main.py:182-183, capgan.py:174)."""
    return jax.tree.map(lambda a, b: segema * a + (1.0 - segema) * b,
                        self_tree, avg_tree)


def ring_shift_tree(stacked, shift: int = 1):
    """Ring-shift client state along the leading axis: client i's model moves
    to client (i+shift) mod N.  The real implementation of MD-GAN's commented
    D-swap.  Under a sharded clients axis this is a collective-permute."""
    return jax.tree.map(lambda x: jnp.roll(x, shift, axis=0), stacked)


def permute_tree(stacked, perm):
    """Permute client state along the leading axis: client i takes member
    ``perm[i]``'s state.  With ``perm`` drawn fresh per swap event this is
    the reference's commented D-swap semantics — a random *shuffle* of the
    received Ds (MDGAN/MNIST/mdgan.py:158-164).

    Multi-chip cost note: because ``perm`` is a traced, data-dependent
    array, GSPMD lowers this gather to an all-gather of the stacked tree
    over the sharded axis, NOT a point-to-point collective-permute.  The
    deterministic ring shift (``ring_shift_tree``) is the TPU-friendly swap;
    choose shuffle for reference-semantics fidelity."""
    return jax.tree.map(lambda x: jnp.take(x, perm, axis=0), stacked)


def neighbor_share_tree(stacked, group_size: int, *, blocked: bool = False):
    """Every-E-rounds neighbour D-share: partition the clients axis into
    contiguous groups of ``group_size`` and replace each member with the group
    mean (the real implementation of AC-GAN's commented gossip,
    ACGAN/MNIST/acgan.py:240-263).

    ``blocked=True``: leaves are already grouped ``(G, group_size, ...)``
    (the (servers, clients_per_server) layout) — the mean runs over axis 1
    with no reshape.  Use this form whenever axis 1 is mesh-sharded: merging
    ``(S, k)`` into ``S*k`` with ``k`` sharded is inexpressible in GSPMD, so
    the flat form forces a full-stack all-gather + re-shard per exchange
    (caught by tests/test_hlo_comm.py); the blocked form lowers to the
    intended segment-sum all-reduce."""
    def share(x):
        if blocked:
            assert x.shape[1] == group_size, (x.shape, group_size)
            mean = jnp.mean(x, axis=1, keepdims=True)
            return jnp.broadcast_to(mean, x.shape)
        n = x.shape[0]
        g = n // group_size
        grouped = x.reshape((g, group_size) + x.shape[1:])
        mean = jnp.mean(grouped, axis=1, keepdims=True)
        return jnp.broadcast_to(mean, grouped.shape).reshape(x.shape)

    return jax.tree.map(share, stacked)


def delta_share_tree(stacked, anchor, group_size: int, *,
                     blocked: bool = False):
    """Delta-accumulating every-E-rounds gossip: the strict-fidelity mode of
    AC-GAN's commented exchange (ACGAN/MNIST/acgan.py:240-263).

    Each member keeps an anchor ``w`` (initialised to zero, acgan.py:235-237)
    and per event: ``g_i = p_i - w_i`` is broadcast to every client of the
    member's server block, the received deltas are averaged over the block
    (``s = mean_k(g)``, the sketch's ``s[key] += gk[key]/k``), the new
    parameters are ``w_i + s`` and the new anchor is the pre-exchange ``p_i``
    (the sketch's ``w += g`` ordering).  This is the only non-degenerate
    completion of the commented code — the literal text deadlocks (k gets
    for k-1 puts), clobbers its accumulator with the loop variable ``s``,
    and its final ``p += s - w`` reduces to ``p = s`` because ``w == p`` at
    that point.  From the zero anchor the first exchange equals the block
    parameter mean (``neighbor_share_tree``); later exchanges differ because
    anchors are per-member.

    Returns ``(new_stacked, new_anchor)``.  ``blocked`` as in
    ``neighbor_share_tree`` — pass the ``(S, k, ...)`` layout directly when
    axis 1 is the sharded clients axis.
    """
    deltas = jax.tree.map(lambda p, w: p - w, stacked, anchor)
    mean_delta = neighbor_share_tree(deltas, group_size, blocked=blocked)
    new_p = jax.tree.map(lambda w, s: w + s, anchor, mean_delta)
    return new_p, stacked


def masked_weighted_avg_tree(stacked, weights, mask):
    """Weighted average over the leading axis counting only ``mask``-selected
    members (partial participation / FeGAN group rounds).  ``weights`` are
    renormalised over the active set."""
    w = jnp.asarray(weights) * jnp.asarray(mask)
    w = w / jnp.maximum(w.sum(), 1e-12)
    return weighted_avg_tree(stacked, w)


def select_update_tree(old_stacked, new_stacked, mask):
    """Per-member select: members with mask=1 take the new state, others keep
    the old (unsampled FeGAN workers stay blocked on their queue,
    SURVEY.md §3.4)."""
    m = jnp.asarray(mask)

    def sel(o, nw):
        mm = m.reshape((-1,) + (1,) * (o.ndim - 1)).astype(o.dtype)
        return o * (1 - mm) + nw * mm

    return jax.tree.map(sel, old_stacked, new_stacked)
