"""AC-GAN and MD-GAN: central generator(s), distributed discriminators,
loss feedback.

Reference protocol (ACGAN/2DMG/acgan.py:102-257, MDGAN/MNIST/mdgan.py:107-297):
each server generates a detached fake batch Xd and a live one Xg, queues both
to its clients; each client trains its D ``epoch`` steps on (real, Xd) and
returns the *live autograd tensor* ``BCE(D(Xg), 1)``; the server averages the
returned losses, backprops them through its own G and steps Adam.

TPU design: the cross-thread autograd disappears — server-G forward, the W
vmapped D updates, and the G backward are one differentiable jitted function
(SURVEY.md §2.3).  The (S servers x k clients) topology is a reshape of the
stacked D state; every per-client op is ``vmap`` over (S, k).

The every-E-rounds exchanges the reference left commented are implemented
for real (cfg.E > 0):
* AC-GAN — clients of one server exchange Ds (ACGAN/MNIST/acgan.py:240-263):
  ``gossip="mean"`` replaces each with the block average; ``gossip="delta"``
  runs the sketch's delta-accumulating exchange (per-worker anchors carried
  in the FedState aux slot; ``fed/collectives.py delta_share_tree``).
* MD-GAN — global ring D-swap (MDGAN/MNIST/mdgan.py:158-164, 258-262).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cglgan_tpu.algos import common, runner as runner_mod
from cglgan_tpu.algos.common import FedState, NetState
from cglgan_tpu.core import prng
from cglgan_tpu.core.config import FedGANConfig
from cglgan_tpu.data.partition import Partition
from cglgan_tpu.fed import collectives
from cglgan_tpu.models.zoo import models_for_config


def build_mdgan_family(cfg: FedGANConfig, part: Partition,
                       mesh=None) -> runner_mod.Runner:
    """algo == "acgan" (multi-server) or "mdgan" (single central G).
    ``mesh``: optional clients-axis mesh for multi-chip SPMD."""
    from jax.sharding import PartitionSpec as P
    from cglgan_tpu.core import meshes
    S, k = cfg.num_servers, cfg.clients_per_server
    if cfg.algo == "mdgan" and S != 1:
        raise ValueError("mdgan has one central generator (num_servers=1)")
    g_model, d_model = models_for_config(cfg)
    head = "raw" if cfg.conv else cfg.resolved_d_head
    adv = common.make_adv_loss(head)
    opt_g = optax.adam(cfg.lr_g, b1=cfg.b1, b2=cfg.b2)
    opt_d = optax.adam(cfg.lr_d, b1=cfg.b1, b2=cfg.b2)
    B, zdim = cfg.batch_size, cfg.latent_dim
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    root = prng.root_key(cfg.seed)

    # shards grouped by server: (S, k, max_len, ...)
    spec_sk = P(None, "clients")
    shards = meshes.place(
        jnp.asarray(part.data).reshape((S, k) + part.data.shape[1:]),
        mesh, spec_sk)

    d_step = common.d_epoch_steps(
        common.d_step_fn(d_model, adv, opt_d, B, cfg.is_image,
                         d_loss_half=False, fuse_concat=not cfg.conv, dtype=dtype),
        cfg.epoch)

    from cglgan_tpu.ops.pallas import fused_dstep
    use_kernel = fused_dstep.eligible(cfg, mesh)

    def init_state():
        gp, gbn, gopt = jax.vmap(
            lambda kk: (lambda p, b: (p, b, opt_g.init(p)))(
                *g_model.init(kk, dtype))
        )(jax.random.split(prng.for_role(root, prng.ROLE_INIT_G), S))
        dn = common.init_net_stacked(
            d_model, prng.for_role(root, prng.ROLE_INIT_D), opt_d, S * k,
            dtype)
        dn = NetState(*jax.tree.map(
            lambda x: x.reshape((S, k) + x.shape[1:]), tuple(dn)))
        dn = NetState(*(meshes.place(t, mesh, spec_sk) for t in dn))
        gn = NetState(*(meshes.place(t, mesh, P()) for t in (gp, gbn, gopt)))
        aux = None
        if cfg.algo == "acgan" and cfg.E > 0 and cfg.gossip == "delta":
            # per-worker gossip anchors, initialised to zero exactly as the
            # reference sketch's `w[key] = 0` (ACGAN/MNIST/acgan.py:235-237);
            # carried in the FedState aux slot so checkpoints restore them
            aux = jax.tree.map(jnp.zeros_like, (dn.params, dn.bn))
        return meshes.commit_tree(FedState(gn, dn, aux, jnp.int32(0)), mesh)

    def server_round(g_net: NetState, d_block: NetState, shard_blk, starts,
                     mask, key):
        """One server's round over its k clients.  ``mask`` (k,): straggler
        simulation — dropped clients keep their D and contribute no loss."""
        k_zd, k_zg, k_d, k_drop = jax.random.split(key, 4)
        # Xd: detached fake batch; BN buffers still advance (torch modules in
        # train mode update running stats even under no_grad)
        z_d = jax.random.normal(k_zd, (B, zdim), dtype)
        xd, gbn1 = g_model.apply(g_net.params, g_net.bn, z_d, train=True)
        xd = jax.lax.stop_gradient(xd)

        # every client trains its D `epoch` steps on (real, Xd); shared
        # window offsets -> one contiguous slice for all k real batches
        d_keys = jax.random.split(k_d, k)
        new_d, d_loss = jax.vmap(d_step, in_axes=(0, 0, None, None, 0))(
            d_block, shard_blk, starts, xd, d_keys)
        new_d = NetState(*(collectives.select_update_tree(o, n, mask)
                           for o, n in zip(tuple(d_block), tuple(new_d))))

        # G update: mean of the surviving clients' losses through the
        # *updated* Ds
        z_g = jax.random.normal(k_zg, (B, zdim), dtype)
        denom = jnp.maximum(mask.sum(), 1.0)

        drop_keys = jax.random.split(k_drop, k)

        def g_obj(gp, gbn):
            fake, gbn2 = g_model.apply(gp, gbn, z_g, train=True)
            per_client, _ = jax.vmap(
                lambda dp, dbn, r: d_model.apply(dp, dbn, fake, train=True,
                                                 rng=r))(
                new_d.params, new_d.bn, drop_keys)
            losses = jax.vmap(lambda o: adv(o, 1.0))(per_client)
            return (losses * mask).sum() / denom, (gbn2, losses)

        (g_loss, (gbn2, losses)), grads = jax.value_and_grad(
            g_obj, has_aux=True)(g_net.params, gbn1)
        up, gopt2 = opt_g.update(grads, g_net.opt, g_net.params)
        new_g = NetState(optax.apply_updates(g_net.params, up), gbn2, gopt2)
        return new_g, new_d, {"d_loss": (d_loss * mask).sum() / denom,
                              "g_loss": g_loss}

    max_len = part.data.shape[1]

    def kernel_round(state: FedState, starts, keys):
        """Same protocol with the local-D phase in the fused Pallas kernel
        (ops/pallas/fused_dstep.py): identical PRNG value draws, float-
        tolerance numerics.  Requires dropout == 0 (no participation mask
        in the kernel path)."""
        new_d, d_loss, gbn1, k_zg, k_drop = fused_dstep.kernel_local_phase(
            cfg, g_model, state.g, state.d, shards, starts, keys,
            multipath=False, dtype=dtype)

        def g_step(gp, gbn1_s, gopt, d_p, d_bn, kzg, kdrop):
            z_g = jax.random.normal(kzg, (B, zdim), dtype)
            drop_keys = jax.random.split(kdrop, k)

            def g_obj(gp_, gbn_):
                fake, gbn2 = g_model.apply(gp_, gbn_, z_g, train=True)
                outs, _ = jax.vmap(
                    lambda dp, dbn, r: d_model.apply(dp, dbn, fake,
                                                     train=True, rng=r))(
                    d_p, d_bn, drop_keys)
                losses = jax.vmap(lambda o: adv(o, 1.0))(outs)
                return losses.mean(), (gbn2, losses)

            (g_loss, (gbn2, _)), grads = jax.value_and_grad(
                g_obj, has_aux=True)(gp, gbn1_s)
            up, gopt2 = opt_g.update(grads, gopt, gp)
            return NetState(optax.apply_updates(gp, up), gbn2, gopt2), g_loss

        new_g, g_loss = jax.vmap(g_step)(
            state.g.params, gbn1, state.g.opt, new_d.params, new_d.bn,
            k_zg, k_drop)
        metrics = {"d_loss": d_loss.mean(), "g_loss": g_loss.mean()}
        return new_g, new_d, metrics

    def round_fn(state: FedState):
        t = state.t
        key = prng.for_round(prng.for_role(root, prng.ROLE_LOCAL), t)
        starts = jax.vmap(
            lambda kk: common.batch_start(kk, max_len, B))(
            jax.random.split(prng.for_role(key, prng.ROLE_BATCH), cfg.epoch))
        keys = jax.random.split(key, S)
        if use_kernel:
            new_g, new_d, metrics = kernel_round(state, starts, keys)
        else:
            mask = common.participation_mask(
                jax.random.fold_in(key, 7), S * k, cfg.dropout_rate
            ).reshape(S, k)
            new_g, new_d, metrics = jax.vmap(
                server_round, in_axes=(0, 0, 0, None, 0, 0))(
                state.g, state.d, shards, starts, mask, keys)
            metrics = jax.tree.map(jnp.mean, metrics)

        if cfg.E > 0:
            # the share/delta/swap paths all stay in the (S, k, ...) block
            # layout: merging (S, k) into S*k with k mesh-sharded is
            # inexpressible in GSPMD and would all-gather the full D stack
            # per exchange (tests/test_hlo_comm.py guards this)
            if cfg.algo == "mdgan":
                flat_d = jax.tree.map(
                    lambda x: x.reshape((S * k,) + x.shape[2:]), new_d)
                if cfg.d_swap == "shuffle":
                    # the reference's commented semantics: a fresh random
                    # shuffle of the received Ds per swap event
                    # (MDGAN/MNIST/mdgan.py:158-164) — seeded by round
                    perm = jax.random.permutation(
                        prng.for_role(key, prng.ROLE_SWAP), S * k)
                    swap = lambda t: collectives.permute_tree(t, perm)
                else:
                    swap = lambda t: collectives.ring_shift_tree(t, 1)
                shared = NetState(swap(flat_d.params), swap(flat_d.bn),
                                  flat_d.opt)
                shared = jax.tree.map(
                    lambda x: x.reshape((S, k) + x.shape[1:]), shared)
            elif cfg.gossip == "delta":
                # strict-fidelity delta-accumulating exchange
                # (ACGAN/MNIST/acgan.py:240-263): anchors live in the aux
                # slot, stored (S, k, ...) like the Ds
                cur = (new_d.params, new_d.bn)
                new_cur, new_anchor = collectives.delta_share_tree(
                    cur, state.lam, k, blocked=True)
                shared = NetState(new_cur[0], new_cur[1], new_d.opt)
                do_share = (t + 1) % cfg.E == 0
                new_lam = jax.tree.map(
                    lambda a, b: jnp.where(do_share, a, b),
                    new_anchor, state.lam)
                new_d = jax.tree.map(
                    lambda a, b: jnp.where(do_share, a, b), shared, new_d)
                return FedState(new_g, new_d, new_lam, t + 1), metrics
            else:
                shared = NetState(
                    collectives.neighbor_share_tree(new_d.params, k,
                                                    blocked=True),
                    collectives.neighbor_share_tree(new_d.bn, k,
                                                    blocked=True),
                    new_d.opt)
            do_share = (t + 1) % cfg.E == 0
            new_d = jax.tree.map(
                lambda a, b: jnp.where(do_share, a, b), shared, new_d)

        return FedState(new_g, new_d, state.lam, t + 1), metrics

    def gen(state: FedState, z):
        """Serving contract: eval-mode samples from caller latents ``z``
        (n, zdim), n divisible by S — one per-server block each."""
        per = z.shape[0] // S
        zs = z.reshape((S, per, zdim))

        def one(gp, gbn, zi):
            out, _ = g_model.apply(gp, gbn, zi, train=False)
            return out

        outs = jax.vmap(one)(state.g.params, state.g.bn, zs)
        return outs.reshape((S * per,) + outs.shape[2:])

    @partial(jax.jit, static_argnames=("n",))
    def sample(state: FedState, n: int):
        """Eval samples: each server contributes n/S (the painter pools
        per-server fixed_z outputs, ACGAN/2DMG/acgan.py:69-75)."""
        per = n // S
        z = jax.vmap(lambda i: jax.random.normal(
            prng.for_member(prng.for_role(root, prng.ROLE_EVAL), i),
            (per, zdim)))(jnp.arange(S))
        return gen(state, z.reshape((S * per, zdim)))

    return runner_mod.Runner(cfg, part, init_state, round_fn, sample,
                             gen=gen, gen_batch_multiple=S)
