"""Shared machinery for all seven federated-GAN algorithms.

The reference re-implements this boilerplate in every entry script (losses,
Adam settings, batch draw, fixed-z sampling — SURVEY.md §0 "heavy copy-paste
duplication"); here it lives once.

GAN losses reproduce the reference's exact choices:
* ``bce``      — torch nn.BCELoss on sigmoid outputs (ACGAN/FLGAN/MDGAN/CGL
                 workers, e.g. FLGAN/MNIST/flgan.py:116).
* ``ce2``      — torch nn.CrossEntropyLoss on 2 raw logits (CAP/Mix MNIST
                 workers, capgan.py:311).
* ``bce_logits`` — numerically-stable BCE on raw logits (conv LSGAN D, which
                 has no sigmoid: model/lsgan.py:92-98).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def bce(p, target: float):
    """Mean BCE against a constant target on probabilities in (0,1).
    Clamped like torch (which clamps log at -100).  Loss math always in
    float32 regardless of model dtype."""
    p = jnp.clip(p.astype(jnp.float32), 1e-12, 1.0 - 1e-7)
    t = target
    return -jnp.mean(t * jnp.log(p) + (1.0 - t) * jnp.log1p(-p))


def ce2(logits, target_idx: int):
    """Mean 2-class cross-entropy against a constant class index."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(logp[:, target_idx])


def bce_logits(logits, target: float):
    z = logits.astype(jnp.float32).squeeze(-1)
    # stable: max(z,0) - z*t + log(1+exp(-|z|))
    return jnp.mean(jnp.maximum(z, 0) - z * target + jnp.log1p(jnp.exp(-jnp.abs(z))))


def make_adv_loss(head: str) -> Callable:
    """Returns loss(d_out, is_real: float) for the configured D head."""
    if head == "sigmoid":
        return lambda out, t: bce(out, t)
    if head == "logits2":
        return lambda out, t: ce2(out, int(t))
    if head == "raw":
        return lambda out, t: bce_logits(out, t)
    raise ValueError(head)


# ---------------------------------------------------------------------------
# data access
# ---------------------------------------------------------------------------

def normalize_images(x):
    """uint8 -> float in [-1,1], the reference's
    ToTensor+Normalize([0.5],[0.5]) (capgan.py:466-469)."""
    x = x.astype(jnp.float32) / 255.0
    x = (x - 0.5) / 0.5
    if x.ndim == 3:
        x = x[:, None, :, :]
    return x


def sample_batch(shard, length, key, batch_size: int):
    """Uniform random-row minibatch (gather).  Kept for reference/testing;
    the hot path uses ``batch_start``+``slice_batch`` below — on TPU a
    dynamic-index gather of B rows costs ~3x the whole D update."""
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(length, 1))
    return jnp.take(shard, idx, axis=0)


def batch_start(key, max_len: int, batch_size: int):
    """A shared random window offset.  Shard rows are independently
    pre-shuffled by the host partitioner (rd.sample order) and wrap-padded,
    so one offset shared across clients yields independent, uniformly
    distributed batches — and the extraction lowers to a single contiguous
    dynamic-slice instead of W scattered gathers."""
    return jax.random.randint(key, (), 0, max(max_len - batch_size + 1, 1))


def slice_batch(shard, start, batch_size: int):
    """Contiguous window [start, start+B) of one client's pre-shuffled shard.
    Under vmap with an unbatched ``start`` this is one sliced load for all
    clients.  Approximately uniform sampling WITH replacement across steps —
    a deliberate delta from the reference's no-repeat-per-epoch DataLoader
    draw (docs/MIGRATION.md "Semantics that intentionally differ" #5)."""
    return jax.lax.dynamic_slice_in_dim(shard, start, batch_size, axis=0)


def prepare_real(batch, is_image: bool, dtype=jnp.float32):
    """Image shards are stored flat (B, H*W) uint8 for slice-friendly layout;
    MLP discriminators consume them flat, conv ones reshape at apply time.
    ``dtype``: compute dtype (bfloat16 keeps matmuls on the fast MXU path
    when the model is bf16 — mixed f32xbf16 would silently promote)."""
    out = normalize_images(batch) if is_image else batch
    return out.astype(dtype)


def participation_mask(key, n: int, dropout_rate: float):
    """Straggler/dropout simulation: per-client survival mask for one round.
    Guarantees at least one survivor (the round never deadlocks, unlike the
    reference's blocking queues would).  Returns float (n,) of {0,1}."""
    if dropout_rate <= 0.0:
        return jnp.ones((n,), jnp.float32)
    alive = jax.random.bernoulli(key, 1.0 - dropout_rate, (n,))
    none_alive = ~alive.any()
    alive = alive.at[0].set(alive[0] | none_alive)
    return alive.astype(jnp.float32)


# ---------------------------------------------------------------------------
# state containers
# ---------------------------------------------------------------------------

class NetState(NamedTuple):
    """One network (possibly stacked on a leading federation axis)."""
    params: Any
    bn: Any            # batchnorm running stats ("state_dict buffers")
    opt: Any           # optax state


class FedState(NamedTuple):
    g: NetState        # generators — stacked (S, ...) for multi-server algos
    d: NetState        # discriminators — stacked (W, ...)
    lam: Any           # Lambda game variable(s), (S,) or scalar; None if unused
    t: Any             # int32 round counter


def adam(cfg) -> optax.GradientTransformation:
    """Adam(lr, betas=(b1,b2)) exactly as every reference script
    (e.g. CGLGAN/MNIST/main.py:168: lr=2e-4, betas=(0.5, 0.999))."""
    return optax.adam(cfg.lr_g, b1=cfg.b1, b2=cfg.b2, eps=1e-8)


def adam_inline(lr: float, b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-8) -> optax.GradientTransformation:
    """optax.adam-equivalent with one fused tree pass and scalar bias
    corrections — bit-identical update math, fewer intermediate trees.
    Measured against optax.adam in benchmarks/adam_fusion_probe.py."""
    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        count = state.count + 1
        c1 = 1.0 - b1 ** count          # int exponent, like optax's
        c2 = 1.0 - b2 ** count          # bias_correction


        def one(g, mu, nu):
            # op order matches optax.scale_by_adam + scale(-lr) exactly
            # (bit-identical trajectories; benchmarks/adam_fusion_probe.py)
            mu2 = b1 * mu + (1 - b1) * g
            nu2 = b2 * nu + (1 - b2) * (g * g)
            upd = -lr * ((mu2 / c1) / (jnp.sqrt(nu2 / c2) + eps))
            return upd, mu2, nu2

        out = jax.tree.map(one, grads, state.mu, state.nu)
        treedef = jax.tree.structure(grads)
        flat = treedef.flatten_up_to(out)
        upds = treedef.unflatten([t[0] for t in flat])
        mus = treedef.unflatten([t[1] for t in flat])
        nus = treedef.unflatten([t[2] for t in flat])
        return upds, optax.ScaleByAdamState(count=count, mu=mus, nu=nus)

    return optax.GradientTransformation(init, update)


def adam_d(cfg) -> optax.GradientTransformation:
    return optax.adam(cfg.lr_d, b1=cfg.b1, b2=cfg.b2, eps=1e-8)


def init_net(model, key, opt) -> NetState:
    params, bn = model.init(key)
    return NetState(params, bn, opt.init(params))


def init_net_stacked(model, key, opt, n: int, dtype=jnp.float32) -> NetState:
    """n independent inits stacked on axis 0 — one per federated member."""
    def one(k):
        p, b = model.init(k, dtype)
        return p, b, opt.init(p)
    p, b, o = jax.vmap(one)(jax.random.split(key, n))
    return NetState(p, b, o)


def apply_updates(net: NetState, grads, opt, new_bn=None) -> NetState:
    updates, new_opt = opt.update(grads, net.opt, net.params)
    return NetState(optax.apply_updates(net.params, updates),
                    net.bn if new_bn is None else new_bn, new_opt)


# ---------------------------------------------------------------------------
# the per-client discriminator step (the hot op)
# ---------------------------------------------------------------------------

def d_step_fn(d_model, adv_loss, opt, batch_size: int, is_image: bool,
              d_loss_half: bool, fuse_concat: bool = True,
              dtype=jnp.float32):
    """Build ``step(d_net, shard, start, fake, key) -> (d_net, d_loss)``:
    one local D update on (real window, given fakes).  D_loss = real + fake,
    halved for CAP/Mix (capgan.py:339, mixed-gan.py:382).

    vmap this over the stacked clients axis with ``start`` unbatched
    (in_axes=None): W tiny MLP steps fuse into batched matmuls on the MXU and
    the W real batches load as one contiguous slice.

    ``fuse_concat``: run real and fake through ONE forward on the (2B, ...)
    concatenation — halves D weight-read traffic (the D-step is HBM-bound)
    and is exactly equal for stateless Ds:
    mean over 2B == (mean_real + mean_fake)/2.  Disabled for the conv D,
    whose BatchNorm computes per-forward batch statistics."""

    def loss_fn(params, bn, real, fake, rng):
        if fuse_concat:
            if real.ndim != fake.ndim:   # flat real vs NCHW fake (MLP path)
                fake = fake.reshape(fake.shape[0], -1)
            both = jnp.concatenate([real, fake], axis=0)
            out, bn2 = d_model.apply(params, bn, both, train=True, rng=rng)
            # mean over the 2B rows = (loss_real + loss_fake)/2
            half = adv_loss(out[:batch_size], 1.0) * 0.5 \
                + adv_loss(out[batch_size:], 0.0) * 0.5
            loss = half if d_loss_half else half * 2.0
            return loss, bn2
        r1, r2 = jax.random.split(rng)   # independent dropout masks,
        out_r, bn1 = d_model.apply(params, bn, real, train=True, rng=r1)
        out_f, bn2 = d_model.apply(params, bn1, fake, train=True, rng=r2)
        loss = adv_loss(out_r, 1.0) + adv_loss(out_f, 0.0)
        if d_loss_half:
            loss = loss * 0.5
        return loss, bn2

    def step(d_net: NetState, shard, start, fake, key):
        real = prepare_real(slice_batch(shard, start, batch_size), is_image,
                            dtype)
        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            d_net.params, d_net.bn, real, jax.lax.stop_gradient(fake), key)
        updates, new_opt = opt.update(grads, d_net.opt, d_net.params)
        return NetState(optax.apply_updates(d_net.params, updates),
                        new_bn, new_opt), loss

    return step


def d_epoch_steps(step, epoch: int):
    """Repeat a local D step ``epoch`` times (the reference inner loop,
    capgan.py:324-341).  ``starts``: (epoch,) shared window offsets."""
    if epoch == 1:
        def single(d_net, shard, starts, fake, key):
            return step(d_net, shard, starts[0], fake, key)
        return single

    def multi(d_net, shard, starts, fake, key):
        def body(carry, inp):
            net, _ = carry
            st, k = inp
            net, loss = step(net, shard, st, fake, k)
            return (net, loss), None
        (net, loss), _ = jax.lax.scan(body, (d_net, jnp.float32(0)),
                                      (starts, jax.random.split(key, epoch)))
        return net, loss
    return multi
