"""VMEM-resident fused local D-epoch kernel (Pallas TPU).

The per-client discriminator update is the hot op of every algorithm
(PERF.md).  At ``epoch == 1`` XLA's fusion is already near-optimal (see the
fused-Adam negative result), but at ``epoch > 1`` the jitted scan re-reads
and re-writes every D parameter and Adam moment from HBM once per local
step.  This kernel runs ALL ``E`` local steps for one client inside a single
``pallas_call`` program with the client's full D state (params + both Adam
moments) resident in VMEM: HBM traffic drops from E×(read+write) to
1×(read+write) of the state plus the E real mini-batches.

Covers the MLP discriminator family (din-h1-h2-out, LeakyReLU 0.2) with both
reference heads:
* ``sigmoid`` — 1 logit + clipped BCE (ACGAN/FLGAN/MDGAN/CGL workers,
  e.g. FLGAN/MNIST/flgan.py:116); loss = bce_real + bce_fake.
* ``logits2`` — 2 raw logits + CrossEntropy (CAP/Mix MNIST workers,
  capgan.py:311); loss = (ce_real + ce_fake) * 0.5 when ``d_loss_half``.

Numerics match ``algos.common.d_step_fn(fuse_concat=True)`` +
``d_epoch_steps`` + ``optax.adam`` to float tolerance (matmul accumulation
order differs MXU vs XLA); certified in tests/test_pallas_dstep.py and
benchmarked in benchmarks/pallas_dstep_probe.py.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _adam(p, mu, nu, g, c1, c2, lr, b1, b2, eps=1e-8):
    """One optax.adam-ordered update (see common.adam_inline)."""
    mu2 = b1 * mu + (1 - b1) * g
    nu2 = b2 * nu + (1 - b2) * (g * g)
    p2 = p + (-lr) * ((mu2 / c1) / (jnp.sqrt(nu2 / c2) + eps))
    return p2, mu2, nu2


def _dstep_kernel(cc_ref, reals_ref, fake_ref, *refs,
                  E: int, B: int, head: str, d_loss_half: bool,
                  is_image: bool, lr: float, b1: float, b2: float,
                  mxu_bf16: bool = False):
    """All E local D steps for ONE client, state resident in VMEM.

    ``cc_ref``: (1, E, 2) SMEM per-client Adam bias corrections
    (1-b1^t, 1-b2^t), precomputed outside (Mosaic has no powf lowering on
    this stack); per-client because counts can diverge between clients
    (e.g. resuming a checkpoint trained with dropout masking).
    ``refs`` = 18 input state refs, 18 aliased output state refs, loss ref.
    Biases arrive shaped (1, 1, h) so every in-kernel tensor is >= 2-D.

    State refs may be bfloat16 (the production --dtype bfloat16 mode): the
    kernel upcasts on load and keeps the Adam state and every elementwise
    step in float32, so across the E local steps the state is rounded to
    bf16 ONCE (at the store) instead of once per step as in the XLA bf16
    path — strictly tighter numerics at half the HBM state traffic.  With
    ``mxu_bf16`` the six dots per step feed the MXU bf16 inputs with f32
    accumulation (the XLA bf16 path's own matmul precision), recovering
    the 2x MXU rate the f32-in-VMEM variant gives up."""
    state_in, state_out, loss_ref = refs[:18], refs[18:36], refs[36]
    fake = fake_ref[0].astype(jnp.float32)                # (B, din)

    def dot(a, b, dims=None):
        if mxu_bf16:
            a, b = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
        if dims is None:
            return jnp.dot(a, b, preferred_element_type=jnp.float32)
        return jax.lax.dot_general(a, b, (dims, ((), ())),
                                   preferred_element_type=jnp.float32)

    # VMEM-resident f32 copies of the whole optimizer state
    (w1, bb1, w2, bb2, w3, bb3,
     m1, mb1, m2, mb2, m3, mb3,
     n1, nb1, n2, nb2, n3, nb3) = (r[0].astype(jnp.float32)
                                   for r in state_in)

    mult = 1.0 if d_loss_half else 2.0
    loss_out = jnp.zeros((), jnp.float32)

    for e in range(E):                                    # static unroll
        real = reals_ref[0, e]
        if real.dtype == jnp.uint8:
            # Mosaic has no u8->f32 cast; hop through int32
            real = real.astype(jnp.int32)
        real = real.astype(jnp.float32)
        if is_image:
            real = (real / 255.0 - 0.5) / 0.5
        x = jnp.concatenate([real, fake], axis=0)         # (2B, din)

        # ---- forward ----
        z1 = dot(x, w1) + bb1
        h1 = jnp.where(z1 >= 0, z1, 0.2 * z1)
        z2 = dot(h1, w2) + bb2
        h2 = jnp.where(z2 >= 0, z2, 0.2 * z2)
        z3 = dot(h2, w3) + bb3

        is_real = (jax.lax.broadcasted_iota(jnp.int32, (2 * B, 1), 0)
                   < B).astype(jnp.float32)               # (2B, 1)
        if head == "sigmoid":
            p = jax.nn.sigmoid(z3)                        # (2B, 1)
            pc = jnp.clip(p, 1e-12, 1.0 - 1e-7)
            # loss = [bce(real,1) + bce(fake,0)] * (0.5 if half)
            per = -(is_real * jnp.log(pc)
                    + (1 - is_real) * jnp.log1p(-pc))
            loss = (mult * 0.5) * jnp.sum(per) / B
            # d loss / d pc, zero where the clip is active
            dpc = (mult * 0.5 / B) * (
                is_real * (-1.0 / pc) + (1 - is_real) * (1.0 / (1.0 - pc)))
            inside = ((p > 1e-12) & (p < 1.0 - 1e-7)).astype(jnp.float32)
            g3 = dpc * inside * p * (1.0 - p)             # (2B, 1)
        else:                                             # logits2 + CE
            zmax = jnp.max(z3, axis=-1, keepdims=True)
            zs = z3 - zmax
            lse = jnp.log(jnp.sum(jnp.exp(zs), axis=-1, keepdims=True))
            logp = zs - lse                               # (2B, 2)
            # real rows: class 1; fake rows: class 0
            tgt = jnp.concatenate([1.0 - is_real, is_real], axis=1)
            loss = (mult * 0.5) * (-jnp.sum(tgt * logp) / B)
            g3 = (mult * 0.5 / B) * (jnp.exp(logp) - tgt)  # (2B, 2)

        # ---- backward ----
        dw3 = dot(h2, g3, ((0,), (0,)))
        db3 = jnp.sum(g3, axis=0, keepdims=True)
        gh2 = dot(g3, w3, ((1,), (1,)))
        dz2 = gh2 * jnp.where(z2 >= 0, 1.0, 0.2)
        dw2 = dot(h1, dz2, ((0,), (0,)))
        db2 = jnp.sum(dz2, axis=0, keepdims=True)
        gh1 = dot(dz2, w2, ((1,), (1,)))
        dz1 = gh1 * jnp.where(z1 >= 0, 1.0, 0.2)
        dw1 = dot(x, dz1, ((0,), (0,)))
        db1 = jnp.sum(dz1, axis=0, keepdims=True)

        # ---- Adam (shared count across the 6 tensors, like optax) ----
        c1 = cc_ref[0, e, 0]
        c2 = cc_ref[0, e, 1]
        w1, m1, n1 = _adam(w1, m1, n1, dw1, c1, c2, lr, b1, b2)
        bb1, mb1, nb1 = _adam(bb1, mb1, nb1, db1, c1, c2, lr, b1, b2)
        w2, m2, n2 = _adam(w2, m2, n2, dw2, c1, c2, lr, b1, b2)
        bb2, mb2, nb2 = _adam(bb2, mb2, nb2, db2, c1, c2, lr, b1, b2)
        w3, m3, n3 = _adam(w3, m3, n3, dw3, c1, c2, lr, b1, b2)
        bb3, mb3, nb3 = _adam(bb3, mb3, nb3, db3, c1, c2, lr, b1, b2)
        loss_out = loss                                    # last step's loss

    new_state = (w1, bb1, w2, bb2, w3, bb3,
                 m1, mb1, m2, mb2, m3, mb3,
                 n1, nb1, n2, nb2, n3, nb3)
    for ref, val in zip(state_out, new_state):
        ref[0] = val.astype(ref.dtype)
    # the loss block is the full (W, 128) array shared by all programs;
    # each program writes its own row (lane-padded scalar)
    i = pl.program_id(0)
    loss_ref[pl.ds(i, 1), :] = loss_out * jnp.ones((1, 128), jnp.float32)


def eligible(cfg, mesh) -> bool:
    """Whether the fused kernel can replace the local-D phase for this
    config: MLP discriminators only, f32 or bf16, single-chip, no dropout
    (the kernel path implements no participation mask; per-client Adam
    counts themselves are supported), supported heads.  The win is ~3x on
    the D phase at epoch >= 2 and ~parity at epoch == 1
    (benchmarks/pallas_dstep_probe.py); with ``cfg.pallas_dstep is None``
    (auto) it engages at epoch > 1 **for float32 only**: under ``--dtype
    bfloat16`` the XLA path halves its HBM traffic and doubles its MXU
    rate while the kernel computes f32 in VMEM, and measured on-chip the
    XLA bf16 path wins (capgan MNIST epoch=5: 1654 r/s XLA vs 1409 r/s
    kernel) — so bf16 runs the kernel only when forced with
    ``pallas_dstep=True`` (kept for its strictly tighter numerics: state
    is rounded to bf16 once per E steps instead of once per step, see
    ``_dstep_kernel``)."""
    if cfg.pallas_dstep is False:
        return False
    head = cfg.resolved_d_head
    ok = (not cfg.conv and cfg.dtype in ("float32", "bfloat16")
          and mesh is None
          and cfg.dropout_rate == 0.0 and head in ("sigmoid", "logits2"))
    if cfg.pallas_dstep is True:
        if not ok:
            raise ValueError(
                "pallas_dstep=True requires an MLP discriminator, float32 "
                "or bfloat16, no --devices mesh and no dropout")
        return True
    return ok and cfg.dtype == "float32" and cfg.epoch > 1


def unpack_net_generic(net):
    """Stacked NetState (flat leading axis) -> (params, mu, nu, count) as
    flat per-layer [w, b, w, b, ...] tensor lists, for an MLP with any
    number of linear layers.

    The MLP param list is [{w,b}, None, {w,b}, None, ...]; the optax.adam
    state is (ScaleByAdamState, EmptyState) with mu/nu mirroring the param
    tree and a per-member count vector."""
    def flat_of(tree):
        out = []
        for p in tree:
            if isinstance(p, dict):
                out.extend([p["w"], p["b"]])
        return out

    adam_state = net.opt[0]
    return (flat_of(net.params), flat_of(adam_state.mu),
            flat_of(adam_state.nu), adam_state.count)


def repack_net_generic(net, flat_p, flat_mu, flat_nu, new_count):
    """Write flat per-layer tensor lists back into the NetState tree."""
    def put(tree, flat):
        out, j = [], 0
        for p in tree:
            if isinstance(p, dict):
                out.append({"w": flat[2 * j], "b": flat[2 * j + 1]})
                j += 1
            else:
                out.append(p)
        return out

    adam_state = net.opt[0]
    new_adam = adam_state._replace(count=new_count,
                                   mu=put(adam_state.mu, flat_mu),
                                   nu=put(adam_state.nu, flat_nu))
    return net._replace(params=put(net.params, flat_p),
                        opt=(new_adam,) + tuple(net.opt[1:]))


def unpack_net(net):
    """3-layer-MLP special case of ``unpack_net_generic`` (6-tuples)."""
    p, mu, nu, count = unpack_net_generic(net)
    return tuple(p), tuple(mu), tuple(nu), count


def repack_net(net, six, mu6, nu6, new_count):
    return repack_net_generic(net, list(six), list(mu6), list(nu6),
                              new_count)


def kernel_d_phase(net, shards_flat, starts, fake_flat, cfg,
                   fake_per_client: bool):
    """Drop-in local-D phase over a FLAT (W, ...) stacked NetState.

    shards_flat: (W, L, din); starts: (epoch,) shared window offsets;
    fake_flat: (W, B, din) per-client fakes (set ``fake_per_client``) or
    (B, din) shared.  Returns (new_net, d_loss (W,))."""
    B = cfg.batch_size
    E = cfg.epoch
    head = cfg.resolved_d_head
    d_loss_half = cfg.algo in ("capgan", "mixgan")
    reals = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(shards_flat, starts[e], B, axis=1)
         for e in range(E)], axis=1)                      # (W, E, B, din)
    six, mu6, nu6, count = unpack_net(net)
    new_p, new_mu, new_nu, _, losses = fused_d_epoch_steps(
        six, mu6, nu6, count, reals, fake_flat, head=head,
        d_loss_half=d_loss_half, is_image=cfg.is_image,
        lr=cfg.lr_d, b1=cfg.b1, b2=cfg.b2, fake_per_client=fake_per_client)
    return repack_net(net, new_p, new_mu, new_nu, count + E), losses


def kernel_local_phase(cfg, g_model, g_net, d_net, shards_sk, starts, keys,
                       multipath: bool, dtype):
    """Shared kernel-round prelude for the CGL and MD-GAN families: the
    per-server Xd generation (identical PRNG split order to the XLA
    ``server_round``: k_zd, k_zg, k_d, k_drop), per-client fake routing
    (multipath: head i -> client i, mixed-gan.py:247-252; else the full
    batch to every client), flat-W fused D phase and (S, k) unflatten.

    g_net: stacked (S, ...) NetState; d_net: stacked (S, k, ...) NetState;
    shards_sk: (S, k, max_len, ...); starts: (epoch,); keys: (S,) PRNG keys.
    Returns (new_d (S, k), d_loss (W,), gbn1, k_zg, k_drop)."""
    from cglgan_tpu.algos.common import NetState
    S, k, max_len = shards_sk.shape[0], shards_sk.shape[1], shards_sk.shape[2]
    W = S * k
    B, zdim = cfg.batch_size, cfg.latent_dim

    def gen_xd(gp, gbn, kk):
        k_zd, k_zg, _k_d, k_drop = jax.random.split(kk, 4)
        z_d = jax.random.normal(k_zd, (B, zdim), dtype)
        xd, gbn1 = g_model.apply(gp, gbn, z_d, train=True)
        return jax.lax.stop_gradient(xd), gbn1, k_zg, k_drop

    xd, gbn1, k_zg, k_drop = jax.vmap(gen_xd)(g_net.params, g_net.bn, keys)
    din = int(np.prod(cfg.img_shape)) if cfg.is_image else 2
    if multipath:       # head i's batch -> client i, (S, k, B, ...) flat
        fake_flat = xd.reshape(W, B, din)
    else:               # full batch to every client of the server
        fake_flat = jnp.broadcast_to(
            xd.reshape(S, 1, B, din), (S, k, B, din)).reshape(W, B, din)
    d_flat = NetState(*jax.tree.map(
        lambda x: x.reshape((W,) + x.shape[2:]), tuple(d_net)))
    new_d_flat, d_loss = kernel_d_phase(
        d_flat, shards_sk.reshape(W, max_len, -1), starts, fake_flat, cfg,
        fake_per_client=True)
    new_d = NetState(*jax.tree.map(
        lambda x: x.reshape((S, k) + x.shape[1:]), tuple(new_d_flat)))
    return new_d, d_loss, gbn1, k_zg, k_drop


def _bias_corrections(count, W: int, E: int, b1: float, b2: float):
    """(W, E, 2) per-member optax bias corrections for steps
    count_w+1 .. count_w+E, computed with the same int-exponent power optax
    uses.  ``count`` may be a scalar or a (W,) vector — per-member counts
    can diverge (dropout masking via select_update_tree, FeGAN partial
    participation), e.g. when resuming such a checkpoint."""
    counts = jnp.broadcast_to(jnp.asarray(count, jnp.int32).reshape(-1),
                              (W,))
    steps = counts[:, None] + jnp.arange(1, E + 1, dtype=jnp.int32)[None, :]
    return jnp.stack([1.0 - b1 ** steps, 1.0 - b2 ** steps],
                     axis=2).astype(jnp.float32)


def fused_d_epoch_steps(params: Tuple, mu: Tuple, nu: Tuple, count,
                        reals, fake, *, head: str = "sigmoid",
                        d_loss_half: bool = False, is_image: bool = True,
                        lr: float = 2e-4, b1: float = 0.5, b2: float = 0.999,
                        fake_per_client: bool = False,
                        interpret=None):
    """Run E local D steps for W clients in one kernel.

    params/mu/nu: 6-tuples (w1 (W,din,h1), b1 (W,h1), w2, b2, w3, b3).
    count: () or (W,) int32 per-client Adam step counts (pre-increment).
    reals: (W, E, B, din) — pre-sliced real windows (u8 for images, f32 2dmg).
    fake:  (B, din) shared fakes or (W, B, din) when ``fake_per_client``.

    Returns (new_params, new_mu, new_nu, new_count, losses (W,)).
    The kernel aliases the 18 state tensors in place.
    """
    if interpret is None:
        # the TPU lowering needs real hardware; CPU (tests, dryruns) runs
        # the interpreter — same numerics, no Mosaic
        interpret = jax.default_backend() != "tpu"
    W, E, B, din = reals.shape

    def lift(six):
        # biases (W, h) -> (W, 1, h) so in-kernel blocks are 2-D
        w1_, b1_, w2_, b2_, w3_, b3_ = six
        return [w1_, b1_[:, None, :], w2_, b2_[:, None, :],
                w3_, b3_[:, None, :]]

    tensors = lift(params) + lift(mu) + lift(nu)
    assert len(tensors) == 18

    if fake.ndim == 2:
        fake = fake[None]
    fake_idx = (lambda i: (i, 0, 0)) if fake_per_client else \
        (lambda i: (0, 0, 0))

    def state_spec(x):
        return pl.BlockSpec((1,) + x.shape[1:], lambda i: (i,) + (0,) * (x.ndim - 1),
                            memory_space=pltpu.VMEM)

    in_specs = (
        [pl.BlockSpec((1, E, 2), lambda i: (i, 0, 0),
                      memory_space=pltpu.SMEM)]              # bias corr
        + [pl.BlockSpec((1, E, B, din), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)]            # reals
        + [pl.BlockSpec((1, B, din), fake_idx,
                        memory_space=pltpu.VMEM)]            # fake
        + [state_spec(t) for t in tensors]
    )
    out_specs = tuple(
        [state_spec(t) for t in tensors]
        + [pl.BlockSpec((W, 128), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)])           # loss rows
    out_shape = tuple(
        [jax.ShapeDtypeStruct(t.shape, t.dtype) for t in tensors]
        + [jax.ShapeDtypeStruct((W, 128), jnp.float32)])

    kernel = functools.partial(
        _dstep_kernel, E=E, B=B, head=head, d_loss_half=d_loss_half,
        is_image=is_image, lr=lr, b1=b1, b2=b2,
        # bf16 state -> feed the MXU bf16 inputs (f32 accumulate), the
        # XLA bf16 path's own matmul precision; f32 state keeps f32 dots
        mxu_bf16=(params[0].dtype == jnp.bfloat16))

    state_bytes = sum(int(np.prod(t.shape[1:])) * 4 for t in tensors)
    act_bytes = (E * B * din + 3 * B * din) * 4 + 6 * (2 * B * 512) * 4
    outs = pl.pallas_call(
        kernel,
        grid=(W,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        # state tensors are inputs 3..20 -> outputs 0..17, updated in place
        input_output_aliases={3 + j: j for j in range(18)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(128 * 1024 * 1024,
                                 2 * (state_bytes + act_bytes) + (1 << 20))),
        interpret=interpret,
    )(_bias_corrections(count, W, E, b1, b2), reals, fake, *tensors)

    def drop(six):
        w1_, b1_, w2_, b2_, w3_, b3_ = six
        return (w1_, b1_[:, 0, :], w2_, b2_[:, 0, :], w3_, b3_[:, 0, :])

    new_tensors, losses = outs[:18], outs[18]
    return (drop(new_tensors[:6]), drop(new_tensors[6:12]),
            drop(new_tensors[12:18]), jnp.asarray(count) + E,
            losses[:, 0])
