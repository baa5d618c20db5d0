"""CGL-GAN, CAP-GAN and Mix-G: the 3-tier cloud/edge/client hierarchy with
the Lambda minimax game.

Reference protocol (CGLGAN/MNIST/main.py:79-394, capgan.py:86-349,
mixed-gan.py:91-393): every round each edge server generates a detached fake
batch Xd and a live batch Xg; clients train their Ds on (real, Xd) and return
per-client generator losses; the server updates personalization heads on
sum(l) with the trunk frozen, the trunk on the game objective F with heads
frozen, and the Lambda variable by its own rule; every ``cloud_epoch`` rounds
the cloud aggregates server trunks weighted by server data size and each
server sigma-mixes the average back in.

Variant matrix (all switchable; defaults follow the reference scripts):

| algo   | generator        | worker loss       | D*0.5 | cloud scope | cadence            |
|--------|------------------|-------------------|-------|-------------|--------------------|
| cglgan | multi-path       | BCE (sigmoid)     | no    | trunk       | cloud_epoch rounds |
| capgan | single path      | CE (2 logits)     | yes   | full G      | data_len*H/B rounds|
| mixgan | multi-path+DCGAN | CE (2 logits)     | yes   | trunk       | cloud_epoch rounds |

(capgan cadence: capgan.py:169; the D*0.5: capgan.py:339; DCGAN weights_init
on Mix-G G and D: mixed-gan.py:181,348.)

TPU design: the whole hierarchy is one jitted round — clients are a vmap over
the (S, k) reshape of the stacked D state, the multi-path generator's heads
are vmapped experts, the cross-thread loss feedback is straight-line autodiff
and the cloud is a weighted mean over the servers axis (SURVEY.md §2.2).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cglgan_tpu.algos import common, runner as runner_mod
from cglgan_tpu.algos.common import FedState, NetState
from cglgan_tpu.algos.game import game_step
from cglgan_tpu.core import prng
from cglgan_tpu.core.config import FedGANConfig
from cglgan_tpu.data.partition import Partition
from cglgan_tpu.fed import collectives, topology
from cglgan_tpu.models import nn as fnn
from cglgan_tpu.models.zoo import models_for_config


def build_cgl_family(cfg: FedGANConfig, part: Partition,
                     mesh=None) -> runner_mod.Runner:
    """``mesh``: optional jax.sharding.Mesh with a 'clients' axis — client
    shards and all stacked-per-client state are placed split over it, so the
    same jitted round partitions across chips (SPMD; FedAvg and the loss
    reductions lower to ICI collectives)."""
    from jax.sharding import PartitionSpec as P
    from cglgan_tpu.core import meshes
    S, k = cfg.num_servers, cfg.clients_per_server
    algo = cfg.algo
    # single-path CGL when iid==0, matching models_for_config (the reference
    # builds Generator(ims, 1) there, CGLGAN/MNIST/main.py:167)
    multipath = algo == "mixgan" or (algo == "cglgan" and cfg.iid != 0)
    g_model, d_model = models_for_config(cfg)
    head = "raw" if cfg.conv else cfg.resolved_d_head
    adv = common.make_adv_loss(head)
    d_loss_half = algo in ("capgan", "mixgan")
    weighting = cfg.resolved_weighting
    opt_g = optax.adam(cfg.lr_g, b1=cfg.b1, b2=cfg.b2)
    opt_d = optax.adam(cfg.lr_d, b1=cfg.b1, b2=cfg.b2)
    B, zdim = cfg.batch_size, cfg.latent_dim
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    root = prng.root_key(cfg.seed)

    spec_sk = P(None, "clients")
    shards = meshes.place(
        jnp.asarray(part.data).reshape((S, k) + part.data.shape[1:]),
        mesh, spec_sk)
    beta = jnp.asarray(topology.server_beta(part.lengths, S))      # (S, k)
    data_len = topology.server_data_len(part.lengths, S)           # (S,)
    a_weights = jnp.asarray((data_len / data_len.sum()).astype(np.float32))

    # cloud-sync period per server
    if algo == "capgan":
        # capgan.py:169 — period scales with server data size
        periods = np.maximum(
            1, (data_len * cfg.cloud_epoch / cfg.batch_size).astype(np.int64))
    else:
        periods = np.full(S, max(cfg.cloud_epoch, 1), dtype=np.int64)
    periods_dev = jnp.asarray(periods)
    cloud_enabled = cfg.cloud_epoch > 0

    d_step = common.d_epoch_steps(
        common.d_step_fn(d_model, adv, opt_d, B, cfg.is_image,
                         d_loss_half, fuse_concat=not cfg.conv, dtype=dtype),
        cfg.epoch)

    from cglgan_tpu.ops.pallas import fused_dstep
    use_kernel = fused_dstep.eligible(cfg, mesh)

    def init_state():
        def init_g(kk):
            p, b = g_model.init(kk, dtype)
            if algo == "mixgan":   # net_g.apply(weights_init), mixed-gan.py:181
                p = fnn.dcgan_reinit(jax.random.fold_in(kk, 99), p)
            return p, b, opt_g.init(p)

        gp, gbn, gopt = jax.vmap(init_g)(
            jax.random.split(prng.for_role(root, prng.ROLE_INIT_G), S))

        def init_d(kk):
            p, b = d_model.init(kk, dtype)
            if algo == "mixgan":   # net_d.apply(weights_init), mixed-gan.py:348
                p = fnn.dcgan_reinit(jax.random.fold_in(kk, 98), p)
            return p, b, opt_d.init(p)

        dp, dbn, dopt = jax.vmap(init_d)(
            jax.random.split(prng.for_role(root, prng.ROLE_INIT_D), S * k))
        dn = NetState(*jax.tree.map(
            lambda x: x.reshape((S, k) + x.shape[1:]), (dp, dbn, dopt)))
        dn = NetState(*(meshes.place(t, mesh, spec_sk) for t in dn))
        if cfg.model_shards > 1:
            # optional TP: generator weights (and their mirrored Adam
            # moments) column-sharded over the mesh's `model` axis; the
            # leading servers axis stays replicated (lead=1)
            gn = NetState(*(meshes.place_model_tp(t, mesh, lead=1)
                            for t in (gp, gbn, gopt)))
        else:
            gn = NetState(*(meshes.place(t, mesh, P()) for t in
                            (gp, gbn, gopt)))
        lam = jnp.zeros((S,), jnp.float32)   # Lambda starts at 0 (capgan.py:140)
        return meshes.commit_tree(FedState(gn, dn, lam, jnp.int32(0)), mesh)

    # ------------------------------------------------------------------
    def per_client_losses(gp, gbn, z_g, d_new: NetState, rng):
        """fake = G(z_g) routed per client; l_i = adv(D_i(fake_i), 1)."""
        fake, gbn2 = g_model.apply(gp, gbn, z_g, train=True)
        if multipath:     # head i's batch goes to client i (mixed-gan.py:247-252)
            routed = fake
        else:             # full batch to every client (capgan.py:224-225)
            routed = jnp.broadcast_to(fake[None], (k,) + fake.shape)
        rngs = jax.random.split(rng, k)   # per-client dropout streams (conv D)
        outs, _ = jax.vmap(
            lambda dp, dbn, x, r: d_model.apply(dp, dbn, x, train=True,
                                                rng=r))(
            d_new.params, d_new.bn, routed, rngs)
        losses = jax.vmap(lambda o: adv(o, 1.0))(outs)
        return losses, gbn2

    def server_round(g_net: NetState, d_block: NetState, lam, beta_s,
                     shard_blk, starts, key):
        k_zd, k_zg, k_d, k_drop = jax.random.split(key, 4)
        # Xd (detached; BN buffers advance as torch train-mode no_grad does)
        z_d = jax.random.normal(k_zd, (B, zdim), dtype)
        xd, gbn1 = g_model.apply(g_net.params, g_net.bn, z_d, train=True)
        xd = jax.lax.stop_gradient(xd)

        d_keys = jax.random.split(k_d, k)
        # starts unbatched: all k real batches load as one contiguous slice
        fake_ax = 0 if multipath else None
        new_d, d_loss = jax.vmap(
            d_step, in_axes=(0, 0, None, fake_ax, 0))(
            d_block, shard_blk, starts, xd, d_keys)

        z_g = jax.random.normal(k_zg, (B, zdim), dtype)
        # ONE generator forward; the loss vector is both the workers'
        # returned values (game weights) and the primal for the two
        # constant-weighted backwards — d(sum l)/d(heads) with trunk frozen
        # and d(sum w*l)/d(trunk) with heads frozen are two VJP pullbacks
        # with cotangents (1, ..., 1) and w (CGLGAN/MNIST/main.py:272-289).
        losses_fn = lambda gp: per_client_losses(gp, gbn1, z_g, new_d,
                                                 k_drop)
        losses0, pullback, gbn2 = jax.vjp(losses_fn, g_net.params,
                                          has_aux=True)
        game = game_step(weighting, losses0, beta_s, lam, cfg.lr_lambda)

        if multipath:
            g_heads = pullback(jnp.ones_like(losses0))[0]
            g_trunk = pullback(game.w.astype(losses0.dtype))[0]
            grads = {"trunk": g_trunk["trunk"], "heads": g_heads["heads"]}
        else:
            grads = pullback(game.w.astype(losses0.dtype))[0]
        f_max = jnp.sum(game.w * losses0) - game.lam_coeff * lam

        up, gopt2 = opt_g.update(grads, g_net.opt, g_net.params)
        new_g = NetState(optax.apply_updates(g_net.params, up), gbn2, gopt2)
        metrics = {"d_loss": d_loss.mean(), "g_loss": losses0.mean(),
                   "f_max": f_max, "f_beta": game.f_beta,
                   "f_gamma": game.f_gamma, "lambda": game.lam_new}
        return new_g, new_d, game.lam_new, metrics

    # ------------------------------------------------------------------
    # capgan syncs via fedlab SerializationTool.serialize_model, which
    # serializes model.parameters() ONLY (capgan.py:170-175) — each server's
    # G BatchNorm running stats stay local.  cglgan/mixgan sync via
    # copy_parameters (a state_dict walk minus 0-dim tensors,
    # CGLGAN/MNIST/main.py:140-145), which DOES move BN buffers.
    sync_bn = algo != "capgan"

    def cloud_sync(g: NetState, t):
        """Weighted trunk (or full-G) average + sigma-mix, per-server cadence
        mask (CGLGAN/MNIST/main.py:100-112,177-184)."""
        scope = (lambda tree: tree["trunk"]) if multipath else (lambda tree: tree)

        def put(tree, sub):
            if multipath:
                out = dict(tree)
                out["trunk"] = sub
                return out
            return sub

        # the reference counts t DOWN from num_communication and syncs when
        # that countdown is divisible by the period (capgan.py:155,169;
        # CGLGAN/MNIST/main.py:166,177) — round index i maps to T - i
        sync_mask = ((cfg.num_communication - t) % periods_dev) == 0   # (S,)
        payload = (scope(g.params), scope(g.bn)) if sync_bn \
            else (scope(g.params),)
        avg = collectives.masked_weighted_avg_tree(payload, a_weights,
                                                   sync_mask.astype(jnp.float32))
        avg_b = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (S,) + x.shape), avg)
        mixed = collectives.sigma_mix(payload, avg_b, cfg.segema)
        mixed = collectives.select_update_tree(
            payload, mixed, sync_mask.astype(jnp.float32))
        new_params = put(g.params, mixed[0])
        new_bn = put(g.bn, mixed[1]) if sync_bn else g.bn
        return NetState(new_params, new_bn, g.opt)

    max_len = part.data.shape[1]

    def kernel_round(state: FedState, g: NetState, starts, keys):
        """Same protocol with the local-D phase in the fused Pallas kernel
        (ops/pallas/fused_dstep.py): identical PRNG value draws, float-
        tolerance numerics."""
        new_d, d_loss, gbn1, k_zg, k_drop = fused_dstep.kernel_local_phase(
            cfg, g_model, g, state.d, shards, starts, keys, multipath,
            dtype)

        def g_step(gp, gbn1_s, gopt, lam, beta_s, d_p, d_bn, kzg, kdrop):
            z_g = jax.random.normal(kzg, (B, zdim), dtype)
            d_new = NetState(d_p, d_bn, None)
            losses_fn = lambda p: per_client_losses(p, gbn1_s, z_g, d_new,
                                                    kdrop)
            losses0, pullback, gbn2 = jax.vjp(losses_fn, gp, has_aux=True)
            game = game_step(weighting, losses0, beta_s, lam, cfg.lr_lambda)
            if multipath:
                g_heads = pullback(jnp.ones_like(losses0))[0]
                g_trunk = pullback(game.w.astype(losses0.dtype))[0]
                grads = {"trunk": g_trunk["trunk"], "heads": g_heads["heads"]}
            else:
                grads = pullback(game.w.astype(losses0.dtype))[0]
            f_max = jnp.sum(game.w * losses0) - game.lam_coeff * lam
            up, gopt2 = opt_g.update(grads, gopt, gp)
            new_g_s = NetState(optax.apply_updates(gp, up), gbn2, gopt2)
            metrics = {"g_loss": losses0.mean(), "f_max": f_max,
                       "f_beta": game.f_beta, "f_gamma": game.f_gamma,
                       "lambda": game.lam_new}
            return new_g_s, game.lam_new, metrics

        new_g, lam_new, metrics = jax.vmap(g_step)(
            g.params, gbn1, g.opt, state.lam, beta, new_d.params, new_d.bn,
            k_zg, k_drop)
        metrics["d_loss"] = d_loss
        return new_g, new_d, lam_new, metrics

    def round_fn(state: FedState):
        t = state.t
        g = state.g
        if cloud_enabled:
            # always-computed masked average; a lax.cond skip was measured
            # SLOWER (3385 -> 3026 r/s): control-flow overhead exceeds the
            # small aggregation, and the mask already no-ops non-sync rounds
            g = cloud_sync(g, t)
        key = prng.for_round(prng.for_role(root, prng.ROLE_LOCAL), t)
        starts = jax.vmap(
            lambda kk: common.batch_start(kk, max_len, B))(
            jax.random.split(prng.for_role(key, prng.ROLE_BATCH), cfg.epoch))
        keys = jax.random.split(key, S)
        if use_kernel:
            new_g, new_d, lam_new, metrics = kernel_round(state, g, starts,
                                                          keys)
        else:
            new_g, new_d, lam_new, metrics = jax.vmap(
                server_round, in_axes=(0, 0, 0, 0, 0, None, 0))(
                g, state.d, state.lam, beta, shards, starts, keys)
        metrics = jax.tree.map(jnp.mean, metrics)

        if cfg.E > 0:
            # every-E-rounds neighbour D-share within a server's client block
            # — the gossip whose machinery the reference defines but never
            # invokes (para_d queues + Worker.receive_parameter averaging,
            # capgan.py:295-303, mixed-gan.py:325-333)
            # blocked form: the (S, k) layout stays put — flattening with k
            # mesh-sharded would all-gather the D stack (test_hlo_comm.py)
            shared = NetState(
                collectives.neighbor_share_tree(new_d.params, k,
                                                blocked=True),
                collectives.neighbor_share_tree(new_d.bn, k, blocked=True),
                new_d.opt)
            do_share = (t + 1) % cfg.E == 0
            new_d = jax.tree.map(
                lambda a, b: jnp.where(do_share, a, b), shared, new_d)

        return FedState(new_g, new_d, lam_new, t + 1), metrics

    # ------------------------------------------------------------------
    def gen(state: FedState, z):
        """Serving contract: eval-mode samples from caller latents ``z``
        of shape (n, zdim) with n divisible by S; server i generates from
        the contiguous block ``z[i*per:(i+1)*per]`` (per = n // S).
        Painter routing as in `sample`: multi-path output is the concat of
        all heads, strided back down to the per-server quota
        (capgan.py:79-83)."""
        per = z.shape[0] // S
        zs = z.reshape((S, per, zdim))

        def one(gp, gbn, zi):
            out, _ = g_model.apply(gp, gbn, zi, train=False)
            if multipath:
                out = out.reshape((k * per,) + out.shape[2:])[::k]
            return out

        outs = jax.vmap(one)(state.g.params, state.g.bn, zs)
        return outs.reshape((S * per,) + outs.shape[2:])

    def gen_client(state: FedState, z, client: int):
        """Client ``client``'s personalized generator: eval-mode samples
        from caller latents ``z`` (n, zdim), any n.  Reference routing:
        the multi-path G's output chunk i belongs to client i of the
        server's block (mixed-gan.py:242-252, CGLGAN/MNIST/main.py:247-261)
        — so client c is served by head ``c % k`` of server ``c // k``'s G;
        the single-path CAP-GAN serves its server's G.  ``client`` is
        static (baked into the jit/export)."""
        if not 0 <= client < cfg.num_workers:
            raise ValueError(f"client {client} out of range "
                             f"[0, {cfg.num_workers})")
        s_idx, head = client // k, client % k
        gp = jax.tree.map(lambda x: x[s_idx], state.g.params)
        gbn = jax.tree.map(lambda x: x[s_idx], state.g.bn)
        out, _ = g_model.apply(gp, gbn, z, train=False)
        if multipath:
            out = out[head]            # (heads, n, ...) -> client's head
        return out

    @partial(jax.jit, static_argnames=("n",))
    def sample(state: FedState, n: int):
        """Painter semantics: per server, G(fixed_z) in eval mode."""
        per = max(n // S, 1)
        z = jax.vmap(lambda i: jax.random.normal(
            prng.for_member(prng.for_role(root, prng.ROLE_EVAL), i),
            (per, zdim)))(jnp.arange(S))
        return gen(state, z.reshape((S * per, zdim)))

    return runner_mod.Runner(cfg, part, init_state, round_fn, sample,
                             gen=gen, gen_batch_multiple=S,
                             gen_client=gen_client)
