"""FL-GAN and FeGAN: FedAvg of whole G and D with local alternating training.

FL-GAN (FLGAN/2DMG/flgan.py, FLGAN/MNIST/flgan.py): one server broadcasts
(p_g, p_d); each worker loads them, trains locally (2DMG: ``epoch`` batches;
MNIST: ``epoch`` full local epochs), returns the state dicts; server averages
uniformly.

FeGAN (fegan.py): adds (a) KL device scores, (b) per-round exp-score
aggregation weights, (c) the balanced group schedule — only sampled workers
train each round.

TPU design: every worker's local sweep runs from the *same* broadcast
parameters, so the W local sweeps are one ``vmap`` over stacked (opt-state,
shard, steps) — the per-batch D-step/G-step alternation is a ``lax.scan``
whose step count is the max over workers, with per-worker masking for the
reference's ragged "full local epoch" semantics (SURVEY.md §7.3.2/4).
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
from cglgan_tpu.fed.sampling import fegan_scores, init_groups
from cglgan_tpu.models.zoo import models_for_config


def _local_steps(cfg: FedGANConfig, lengths: np.ndarray) -> np.ndarray:
    """Per-worker local step counts for one round."""
    if cfg.resolved_local_sweep == "batches":
        return np.full(len(lengths), cfg.epoch, dtype=np.int32)
    per_epoch = np.ceil(np.asarray(lengths) / cfg.batch_size).astype(np.int32)
    return (cfg.epoch * per_epoch).astype(np.int32)


def _plan_buckets(steps: np.ndarray, max_buckets: int = 4):
    """Partition workers into <= max_buckets step-count buckets.

    The ragged "epochs" sweep (FLGAN/MNIST/flgan.py:249-269) runs every
    vmapped worker lane for max(steps) scan iterations with masking — under
    iid=1 the shard sizes (hence step counts) spread ~20x, so ~2/3 of the
    lane-steps are masked waste (VERDICT r2 weak #3).  Step counts are
    STATIC (they derive from the host partition), so workers can be sorted
    and split into contiguous buckets, each running its own scan of only
    its bucket-max steps.  DP minimises sum(|bucket| * bucket_max), the
    compute-bound lane-step count.  Returns [(worker_idx_array, bucket_max),
    ...] in ascending step order, or None when one bucket is optimal.
    """
    steps = np.asarray(steps)
    n = len(steps)
    if n < 2 or steps.max() == steps.min() or max_buckets < 2:
        return None
    order = np.argsort(steps, kind="stable")
    s = steps[order]
    K = min(max_buckets, n)
    INF = float("inf")
    dp = [[INF] * (n + 1) for _ in range(K + 1)]
    cut = [[0] * (n + 1) for _ in range(K + 1)]
    dp[0][0] = 0
    for k in range(1, K + 1):
        dp[k][0] = 0
        for i in range(1, n + 1):
            for j in range(i):
                c = dp[k - 1][j] + (i - j) * int(s[i - 1])
                if c < dp[k][i]:
                    dp[k][i], cut[k][i] = c, j
    segs = []
    i, k = n, K
    while i > 0:
        j = cut[k][i]
        segs.append((order[j:i].astype(np.int64), int(s[i - 1])))
        i, k = j, k - 1
    segs.reverse()
    return segs if len(segs) > 1 else None


def _sweep_buckets(make_worker, vmapped_args, buckets, starts):
    """Run one vmapped sweep per step-count bucket and reassemble in worker
    order.  ``make_worker(starts_mb, mb)`` returns the per-lane function;
    ``vmapped_args`` is a tuple of stacked (W, ...) trees to gather per
    bucket."""
    # static inverse permutation: bucket-concatenation order -> worker order
    bucket_inv = jnp.asarray(
        np.argsort(np.concatenate([idx for idx, _ in buckets])))
    outs = []
    for idx, mb in buckets:
        idx_dev = jnp.asarray(idx)
        outs.append(jax.vmap(make_worker(starts[:mb], mb))(
            *[jax.tree.map(lambda x: x[idx_dev], a) for a in vmapped_args]))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0)[bucket_inv],
                        *outs)


def _local_sweep(cfg, g_model, d_model, adv, opt_g, opt_d):
    """One worker's local round: ``steps`` iterations of (D step on real +
    fresh fake, unhalved; then G step) — the reference worker train loop
    (FLGAN/2DMG/flgan.py:229-256, fegan.py:282-303).  Iterations beyond
    ``steps`` (ragged epochs) are masked no-ops."""
    B, zdim = cfg.batch_size, cfg.latent_dim
    is_image = cfg.is_image
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

    def d_loss_fn(dp, dbn, real, fake, rng):
        r1, r2 = jax.random.split(rng)
        out_r, bn1 = d_model.apply(dp, dbn, real, train=True, rng=r1)
        out_f, bn2 = d_model.apply(dp, bn1, fake, train=True, rng=r2)
        return adv(out_r, 1.0) + adv(out_f, 0.0), bn2

    def g_loss_fn(gp, gbn, dp, dbn, z, rng):
        fake, gbn2 = g_model.apply(gp, gbn, z, train=True)
        out, _ = d_model.apply(dp, dbn, fake, train=True, rng=rng)
        return adv(out, 1.0), gbn2

    def sweep(gp, gbn, gopt, dp, dbn, dopt, shard, starts, steps, max_steps,
              key):
        def step(carry, inp):
            (gp, gbn, gopt, dp, dbn, dopt) = carry
            key, start, active = inp
            kzd, kzg, kdrop1, kdrop2 = jax.random.split(key, 4)
            # shared window offset: one contiguous slice across all workers
            real = common.prepare_real(
                common.slice_batch(shard, start, B), is_image, dtype)
            # D step: fake regenerated by the local G, gradient to G discarded
            z = jax.random.normal(kzd, (B, zdim), dtype)
            fake, gbn_d = g_model.apply(gp, gbn, z, train=True)
            (d_loss, dbn_n), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(dp, dbn, real,
                                         jax.lax.stop_gradient(fake), kdrop1)
            d_up, dopt_n = opt_d.update(d_grads, dopt, dp)
            dp_n = optax.apply_updates(dp, d_up)
            # G step against the updated D
            z2 = jax.random.normal(kzg, (B, zdim), dtype)
            (g_loss, gbn_n), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(gp, gbn_d, dp_n, dbn_n, z2, kdrop2)
            g_up, gopt_n = opt_g.update(g_grads, gopt, gp)
            gp_n = optax.apply_updates(gp, g_up)

            new = (gp_n, gbn_n, gopt_n, dp_n, dbn_n, dopt_n)
            merged = jax.tree.map(lambda a, b: jnp.where(active, a, b),
                                  new, carry)
            return merged, (jnp.where(active, d_loss, 0.0),
                            jnp.where(active, g_loss, 0.0))

        keys = jax.random.split(key, max_steps)
        actives = jnp.arange(max_steps) < steps
        carry, (dl, gl) = jax.lax.scan(
            step, (gp, gbn, gopt, dp, dbn, dopt), (keys, starts, actives))
        denom = jnp.maximum(steps, 1)
        return carry, dl.sum() / denom, gl.sum() / denom

    return sweep


def _kernel_sweep_all(cfg, state, shards, starts, keys):
    """FedAvg-family local phase in the fused Pallas kernel
    (ops/pallas/fused_sweep.py): identical PRNG draws to ``_local_sweep``
    (z1 from kzd, z2 from kzg per step), float-tolerance numerics.  Returns
    flat stacked (gp, gopt, dp, dopt, d_loss, g_loss); BN state (empty for
    the 2DMG MLPs) passes through unchanged."""
    from cglgan_tpu.ops.pallas import fused_sweep
    W = shards.shape[0]
    B, zdim, E = cfg.batch_size, cfg.latent_dim, cfg.epoch

    def draw(k):
        def one(kk):
            kzd, kzg, _kd1, _kd2 = jax.random.split(kk, 4)
            return (jax.random.normal(kzd, (B, zdim)),
                    jax.random.normal(kzg, (B, zdim)))
        return jax.vmap(one)(jax.random.split(k, E))

    z1, z2 = jax.vmap(draw)(keys)                        # (W, E, B, zdim)
    bcast = lambda tree: jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (W,) + x.shape), tree)
    g_st = NetState(bcast(state.g.params), None, state.g.opt)
    d_st = NetState(bcast(state.d.params), None, state.d.opt)
    new_g, new_d, d_loss, g_loss = fused_sweep.kernel_sweep_phase(
        g_st, d_st, shards, starts, z1, z2, cfg)
    return new_g.params, new_g.opt, new_d.params, new_d.opt, d_loss, g_loss


def build_flgan(cfg: FedGANConfig, part: Partition,
                mesh=None) -> runner_mod.Runner:
    from jax.sharding import PartitionSpec as P
    from cglgan_tpu.core import meshes
    g_model, d_model = models_for_config(cfg)
    adv = common.make_adv_loss(cfg.resolved_d_head if not cfg.conv else "raw")
    opt_g, opt_d = optax.adam(cfg.lr_g, b1=cfg.b1, b2=cfg.b2), \
        optax.adam(cfg.lr_d, b1=cfg.b1, b2=cfg.b2)
    W = cfg.num_workers
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    spec_w = P("clients")
    shards = meshes.place(jnp.asarray(part.data), mesh, spec_w)
    steps_np = _local_steps(cfg, part.lengths)
    steps = jnp.asarray(steps_np)
    max_steps = int(steps_np.max())
    root = prng.root_key(cfg.seed)
    sweep = _local_sweep(cfg, g_model, d_model, adv, opt_g, opt_d)
    from cglgan_tpu.ops.pallas import fused_sweep
    use_kernel = fused_sweep.eligible(cfg, mesh)
    # ragged-sweep bucketing (single-chip: bucketed lane counts break the
    # even sharding a clients mesh needs).  jax.random.split's prefix
    # property (split(k, n)[i] == split(k, m)[i] for i < min(n, m)) keeps
    # every active step's draws identical to the unbucketed path.
    buckets = _plan_buckets(steps_np) if mesh is None and not use_kernel \
        else None

    def init_state():
        kg = prng.for_role(root, prng.ROLE_INIT_G)
        kd = prng.for_role(root, prng.ROLE_INIT_D)
        gp, gbn = g_model.init(kg, dtype)
        dp, dbn = d_model.init(kd, dtype)
        # optimizer state persists per worker across rounds (the reference
        # constructs Adam once per worker thread, FLGAN/2DMG/flgan.py:203-204)
        gopt = meshes.place(jax.vmap(lambda _: opt_g.init(gp))(jnp.arange(W)),
                            mesh, spec_w)
        dopt = meshes.place(jax.vmap(lambda _: opt_d.init(dp))(jnp.arange(W)),
                            mesh, spec_w)
        gp, gbn = meshes.place((gp, gbn), mesh, P())
        dp, dbn = meshes.place((dp, dbn), mesh, P())
        return meshes.commit_tree(
            FedState(NetState(gp, gbn, gopt), NetState(dp, dbn, dopt),
                     None, jnp.int32(0)), mesh)

    max_len = part.data.shape[1]

    def round_fn(state: FedState):
        key = prng.for_round(prng.for_role(root, prng.ROLE_LOCAL), state.t)
        keys = jax.random.split(key, W)
        starts = jax.vmap(
            lambda kk: common.batch_start(kk, max_len, cfg.batch_size))(
            jax.random.split(prng.for_role(key, prng.ROLE_BATCH), max_steps))

        if use_kernel:
            gp, gopt, dp, dopt, d_loss, g_loss = _kernel_sweep_all(
                cfg, state, shards, starts, keys)
            # the 2DMG MLPs carry no BN state; pass it through stacked
            gbn = jax.tree.map(
                lambda x: jnp.broadcast_to(x[None], (W,) + x.shape),
                state.g.bn)
            dbn = jax.tree.map(
                lambda x: jnp.broadcast_to(x[None], (W,) + x.shape),
                state.d.bn)
        elif buckets is not None:
            # one scan per step-count bucket: each runs only bucket_max
            # iterations instead of the global max (the waste VERDICT r2
            # weak #3 measured at ~2/3 of the lane-steps; 4.09x end-to-end
            # on the 16-worker iid=1 MNIST workload, PERF.md)
            def make_worker(st, mb):
                def worker(gopt, dopt, shard, step_i, k):
                    return sweep(state.g.params, state.g.bn, gopt,
                                 state.d.params, state.d.bn, dopt,
                                 shard, st, step_i, mb, k)
                return worker

            (gp, gbn, gopt, dp, dbn, dopt), d_loss, g_loss = _sweep_buckets(
                make_worker, (state.g.opt, state.d.opt, shards, steps, keys),
                buckets, starts)
        else:
            def worker(gopt, dopt, shard, step_i, k):
                return sweep(state.g.params, state.g.bn, gopt,
                             state.d.params, state.d.bn, dopt,
                             shard, starts, step_i, max_steps, k)

            (gp, gbn, gopt, dp, dbn, dopt), d_loss, g_loss = jax.vmap(
                worker)(state.g.opt, state.d.opt, shards, steps, keys)
        if cfg.dropout_rate > 0.0:
            # straggler simulation: dropped workers neither train nor
            # contribute to the aggregate this round
            mask = common.participation_mask(
                jax.random.fold_in(key, 7), W, cfg.dropout_rate)
            agg = lambda tree: collectives.masked_weighted_avg_tree(
                tree, jnp.ones((W,)), mask)
            gopt = collectives.select_update_tree(state.g.opt, gopt, mask)
            dopt = collectives.select_update_tree(state.d.opt, dopt, mask)
            denom = jnp.maximum(mask.sum(), 1.0)
            metrics = {"d_loss": (d_loss * mask).sum() / denom,
                       "g_loss": (g_loss * mask).sum() / denom,
                       "participants": mask.sum()}
        else:
            # uniform FedAvg of params and BN buffers (state_dict transfer
            # minus 0-dim entries, FLGAN/MNIST/flgan.py:148-162)
            agg = collectives.fedavg_tree
            metrics = {"d_loss": d_loss.mean(), "g_loss": g_loss.mean()}
        new_g = NetState(agg(gp), agg(gbn), gopt)
        new_d = NetState(agg(dp), agg(dbn), dopt)
        return FedState(new_g, new_d, None, state.t + 1), metrics

    def gen(state: FedState, z):
        """Serving contract: eval-mode samples from caller latents."""
        out, _ = g_model.apply(state.g.params, state.g.bn, z, train=False)
        return out

    @partial(jax.jit, static_argnames=("n",))
    def sample(state: FedState, n: int):
        z = jax.random.normal(prng.for_role(root, prng.ROLE_EVAL),
                              (n, cfg.latent_dim))
        return gen(state, z)

    return runner_mod.Runner(cfg, part, init_state, round_fn, sample,
                             gen=gen)


def build_fegan(cfg: FedGANConfig, part: Partition,
                mesh=None) -> runner_mod.Runner:
    from jax.sharding import PartitionSpec as P
    from cglgan_tpu.core import meshes
    g_model, d_model = models_for_config(cfg)
    # fegan.py:224 uses BCELoss with the 2-logit model/mnist_model.py D whose
    # Sigmoid is commented out — shape-incompatible in torch.  We implement
    # the intended semantics: sigmoid head + BCE (SURVEY.md §7.3.6 bug policy).
    adv = common.make_adv_loss("sigmoid" if not cfg.conv else "raw")
    if cfg.dataset != "2dmg" and not cfg.conv:
        from cglgan_tpu.models.zoo import build_discriminator
        d_model = build_discriminator("mnist", 1)
    opt_g, opt_d = optax.adam(cfg.lr_g, b1=cfg.b1, b2=cfg.b2), \
        optax.adam(cfg.lr_d, b1=cfg.b1, b2=cfg.b2)
    W = cfg.num_workers
    spec_w = P("clients")
    shards = meshes.place(jnp.asarray(part.data), mesh, spec_w)
    steps_np = _local_steps(cfg, part.lengths)
    steps = jnp.asarray(steps_np)
    max_steps = int(steps_np.max())
    root = prng.root_key(cfg.seed)
    sweep = _local_sweep(cfg, g_model, d_model, adv, opt_g, opt_d)

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    sk = fegan_scores(part.class_freq, part.class_freq.sum(0))
    schedule = init_groups(W, part.class_freq, cfg.frac_workers,
                           num_rounds=cfg.num_communication,
                           num_class=cfg.num_class)
    groups_dev = jnp.asarray(schedule)          # (R, gp_size)
    # first-occurrence lane mask: init_groups only repeats a member in the
    # degenerate group-smaller-than-gp_size fallback; duplicate lanes must
    # count once in the aggregate and write once in the scatter
    lane_valid_np = np.ones(schedule.shape, np.float32)
    for j in range(1, schedule.shape[1]):
        dup = (schedule[:, :j] == schedule[:, j:j + 1]).any(axis=1)
        lane_valid_np[dup, j] = 0.0
    lane_valid_dev = jnp.asarray(lane_valid_np)
    sk_dev = jnp.asarray(sk)
    max_len = part.data.shape[1]
    from cglgan_tpu.ops.pallas import fused_sweep
    use_kernel = fused_sweep.eligible(cfg, mesh)
    # group-gather: with partial participation, train ONLY the gp_size
    # sampled members — gather their (shard, opt, BN) state, sweep, scatter
    # back — instead of sweeping all W and masking away (1-frac) of the
    # FLOPs.  Single-chip only: under a sharded clients axis the dynamic
    # gather would lower to an all-gather and break the even lane layout.
    gather_mode = (mesh is None and not use_kernel
                   and schedule.shape[1] < W)
    # full participation (gp_size == W): the ragged "epochs" sweep buckets
    # by static step count instead, exactly like flgan
    buckets = _plan_buckets(steps_np) \
        if mesh is None and not use_kernel and not gather_mode else None

    def init_state():
        kg = prng.for_role(root, prng.ROLE_INIT_G)
        kd = prng.for_role(root, prng.ROLE_INIT_D)
        gp, gbn = g_model.init(kg, dtype)
        dp, dbn = d_model.init(kd, dtype)
        gopt = meshes.place(jax.vmap(lambda _: opt_g.init(gp))(jnp.arange(W)),
                            mesh, spec_w)
        dopt = meshes.place(jax.vmap(lambda _: opt_d.init(dp))(jnp.arange(W)),
                            mesh, spec_w)
        # BN buffers persist per worker (fedlab serialization moves parameters
        # only, fegan.py:133-134) — stack them
        gbns = meshes.place(jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (W,) + x.shape), gbn),
            mesh, spec_w)
        dbns = meshes.place(jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (W,) + x.shape), dbn),
            mesh, spec_w)
        gp = meshes.place(gp, mesh, P())
        dp = meshes.place(dp, mesh, P())
        return meshes.commit_tree(
            FedState(NetState(gp, gbns, gopt), NetState(dp, dbns, dopt),
                     None, jnp.int32(0)), mesh)

    def round_fn(state: FedState):
        t = state.t
        group = jax.lax.dynamic_index_in_dim(groups_dev, t, 0, keepdims=False)
        if cfg.dropout_rate > 0.0:   # straggler simulation composes with
            drop = common.participation_mask(             # the group schedule
                jax.random.fold_in(prng.for_round(root, t), 7), W,
                cfg.dropout_rate)
        else:
            drop = jnp.ones((W,), jnp.float32)

        key = prng.for_round(prng.for_role(root, prng.ROLE_LOCAL), t)
        keys = jax.random.split(key, W)
        starts = jax.vmap(
            lambda kk: common.batch_start(kk, max_len, cfg.batch_size))(
            jax.random.split(prng.for_role(key, prng.ROLE_BATCH), max_steps))

        keep_if_alive = lambda alive: lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(alive, a, b), new, old)

        if gather_mode:
            # ---- train only the sampled lanes -------------------------
            lane_valid = jax.lax.dynamic_index_in_dim(lane_valid_dev, t, 0,
                                                      keepdims=False)
            m_lane = lane_valid * drop[group]             # (gp_size,)
            w_lane = jnp.exp(sk_dev[group]) * m_lane
            any_alive = w_lane.sum() > 0
            w_lane = w_lane / jnp.maximum(w_lane.sum(), 1e-12)
            take = lambda tree: jax.tree.map(
                lambda x: jnp.take(x, group, axis=0), tree)

            def worker(gbn, gopt, dbn, dopt, shard, step_i, k):
                return sweep(state.g.params, gbn, gopt, state.d.params, dbn,
                             dopt, shard, starts, step_i, max_steps, k)

            (gp, gbn, gopt, dp, dbn, dopt), d_loss, g_loss = jax.vmap(
                worker)(take(state.g.bn), take(state.g.opt),
                        take(state.d.bn), take(state.d.opt),
                        jnp.take(shards, group, axis=0),
                        jnp.take(steps, group), keys[group])

            new_gp = keep_if_alive(any_alive)(
                collectives.weighted_avg_tree(gp, w_lane), state.g.params)
            new_dp = keep_if_alive(any_alive)(
                collectives.weighted_avg_tree(dp, w_lane), state.d.params)
            # scatter local state back; dead lanes — duplicates
            # (lane_valid==0) and dropout casualties (drop==0) — are
            # dropped via an out-of-bounds index, so their old state
            # stays in place without a gather+select pass
            scatter_idx = jnp.where(m_lane > 0, group, W)

            def scatter_sel(old_full, new_lanes):
                return jax.tree.map(
                    lambda full, lane: full.at[scatter_idx].set(
                        lane, mode="drop"), old_full, new_lanes)

            new_g = NetState(new_gp, scatter_sel(state.g.bn, gbn),
                             scatter_sel(state.g.opt, gopt))
            new_d = NetState(new_dp, scatter_sel(state.d.bn, dbn),
                             scatter_sel(state.d.opt, dopt))
            denom = jnp.maximum(m_lane.sum(), 1.0)
            metrics = {"d_loss": (d_loss * m_lane).sum() / denom,
                       "g_loss": (g_loss * m_lane).sum() / denom}
            return FedState(new_g, new_d, None, t + 1), metrics

        # ---- full-width path (kernel / sharded mesh / full participation)
        mask = jnp.zeros((W,), jnp.float32).at[group].set(1.0) * drop
        # w = exp(sk) over the group, normalised (fegan.py:145-146)
        w = jnp.exp(sk_dev) * mask
        any_alive = w.sum() > 0
        w = w / jnp.maximum(w.sum(), 1e-12)

        if use_kernel:
            gp, gopt, dp, dopt, d_loss, g_loss = _kernel_sweep_all(
                cfg, state, shards, starts, keys)
            gbn, dbn = state.g.bn, state.d.bn   # already stacked; no BN in
        elif buckets is not None:               # the 2DMG MLPs
            def make_worker(st, mb):
                def worker(gbn, gopt, dbn, dopt, shard, step_i, k):
                    return sweep(state.g.params, gbn, gopt, state.d.params,
                                 dbn, dopt, shard, st, step_i, mb, k)
                return worker

            (gp, gbn, gopt, dp, dbn, dopt), d_loss, g_loss = _sweep_buckets(
                make_worker, (state.g.bn, state.g.opt, state.d.bn,
                              state.d.opt, shards, steps, keys),
                buckets, starts)
        else:
            def worker(gbn, gopt, dbn, dopt, shard, step_i, k):
                return sweep(state.g.params, gbn, gopt, state.d.params, dbn,
                             dopt, shard, starts, step_i, max_steps, k)

            (gp, gbn, gopt, dp, dbn, dopt), d_loss, g_loss = jax.vmap(
                worker)(state.g.bn, state.g.opt, state.d.bn, state.d.opt,
                        shards, steps, keys)

        # global params: score-weighted aggregate over the sampled group;
        # if every sampled member dropped out, the round is a no-op
        new_gp = keep_if_alive(any_alive)(
            collectives.weighted_avg_tree(gp, w), state.g.params)
        new_dp = keep_if_alive(any_alive)(
            collectives.weighted_avg_tree(dp, w), state.d.params)
        # local state (opt, BN) advances only for sampled workers — unsampled
        # workers stay blocked on their queue in the reference (SURVEY.md §3.4)
        new_g = NetState(new_gp,
                         collectives.select_update_tree(state.g.bn, gbn, mask),
                         collectives.select_update_tree(state.g.opt, gopt, mask))
        new_d = NetState(new_dp,
                         collectives.select_update_tree(state.d.bn, dbn, mask),
                         collectives.select_update_tree(state.d.opt, dopt, mask))
        denom = jnp.maximum(mask.sum(), 1.0)
        metrics = {"d_loss": (d_loss * mask).sum() / denom,
                   "g_loss": (g_loss * mask).sum() / denom}
        return FedState(new_g, new_d, None, t + 1), metrics

    # the server evaluates with a net whose BN buffers were never trained
    # (deserialize moves params only, fegan.py:169) — replicate: fixed init BN
    _, eval_bn = g_model.init(prng.for_role(root, prng.ROLE_INIT_G))

    def gen(state: FedState, z):
        """Serving contract: eval-mode samples from caller latents (with
        the reference's untrained-BN eval quirk above)."""
        out, _ = g_model.apply(state.g.params, eval_bn, z, train=False)
        return out

    @partial(jax.jit, static_argnames=("n",))
    def sample(state: FedState, n: int):
        z = jax.random.normal(prng.for_role(root, prng.ROLE_EVAL),
                              (n, cfg.latent_dim))
        return gen(state, z)

    return runner_mod.Runner(cfg, part, init_state, round_fn, sample,
                             extras={"sk": sk, "schedule": schedule},
                             gen=gen)
