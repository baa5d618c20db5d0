"""VMEM-resident fused local D/G-sweep kernel for the FedAvg family
(Pallas TPU).

FL-GAN and FeGAN interleave a D step and a G step inside every worker's
local round (FLGAN/2DMG/flgan.py:229-256, fegan.py:282-303) — a structure
the local-D-epoch kernel (ops/pallas/fused_dstep.py) cannot cover.  At
``epoch > 1`` the jitted ``lax.scan`` sweep re-reads and re-writes BOTH
networks' parameters and Adam moments from HBM once per local step; the
local phase is HBM-bound (the 2DMG nets are ~60k params each, the batches
tiny).  This kernel runs ALL ``E`` interleaved (D step, G step) iterations
for one worker inside a single ``pallas_call`` program with both full
optimizer states (G+D params + both moment trees, ~1.4 MB f32) resident in
VMEM: HBM state traffic drops from E x (read+write) to 1 x (read+write).

Per local iteration, exactly the reference worker loop:
1. fake  = G(z1)            (forward only, gradient to G discarded)
2. D Adam step on BCE(D(real),1) + BCE(D(fake),0)   (through the concat
   batch — equal for the stateless MLP D)
3. fake2 = G(z2);  G Adam step on BCE(D_new(fake2), 1) — backward through
   the UPDATED D (no D grads) into G.

Covers the 2DMG MLP pairs: G = 100-256-128-2 (FL-GAN, FLGAN/2DMG/model.py)
or 100-32-2 (FeGAN root-script 2DMG shape) with LeakyReLU(0.2)/Tanh, D =
2-128-256-1 sigmoid.  The MNIST generators BatchNorm (~1.5M params x 3
state trees > 16 MB VMEM) and sweep ragged full-epoch semantics — not
covered; ``eligible`` gates on the 2DMG "batches" sweep.

Numerics match ``algos.fedavg_family._local_sweep`` + ``optax.adam`` to
float tolerance (MXU vs XLA accumulation order); certified in
tests/test_pallas_sweep.py, benchmarked in benchmarks/pallas_sweep_probe.py.

**Measured NEGATIVE result on v5e — kept documented, default OFF.**  Unlike
the MNIST-sized D-epoch kernel (533k-param Ds, 784-wide matmuls, 2.2-2.5x),
the 2DMG nets are ~60k params (~240 KB): HBM state traffic is NOT the
bottleneck, and XLA's vmap lowers the W workers into W-batched MXU matmuls
while the kernel grid serialises them one tiny program at a time.
End-to-end federated rounds (benchmarks/pallas_sweep_probe.py, W=16,
B=100): flgan 0.89x/0.92x/0.95x/0.93x/0.85x at E=1/2/5/10/20, fegan
0.78-0.86x — slower everywhere, no crossover.  ``eligible`` therefore
auto-selects False; the kernel runs only when forced (pallas_sweep=True).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cglgan_tpu.ops.pallas.fused_dstep import (_adam, _bias_corrections,
                                               repack_net_generic,
                                               unpack_net_generic)


def _mlp_forward(x, wbs, last: str):
    """Forward through [(w, b), ...] with LeakyReLU(0.2) between layers and
    ``last`` in {"tanh", "sigmoid"} after the final one.  Returns
    (preacts, inputs, out): inputs[i] is the activation fed to layer i."""
    pre, ins = [], []
    h = x
    for i, (w, b) in enumerate(wbs):
        ins.append(h)
        z = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        pre.append(z)
        if i < len(wbs) - 1:
            h = jnp.where(z >= 0, z, 0.2 * z)
        elif last == "tanh":
            h = jnp.tanh(z)
        else:
            h = jax.nn.sigmoid(z)
    return pre, ins, h


def _mlp_backward(dz_last, pre, ins, wbs, need_dx: bool):
    """Backprop from d(loss)/d(z_last) through the LeakyReLU MLP.  Returns
    (grads [(dw, db), ...], dx).  ``dz_last`` is already the gradient at the
    final PRE-activation."""
    grads = [None] * len(wbs)
    dz = dz_last
    for i in range(len(wbs) - 1, -1, -1):
        w, _ = wbs[i]
        dw = jax.lax.dot_general(ins[i], dz, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        db = jnp.sum(dz, axis=0, keepdims=True)
        grads[i] = (dw, db)
        if i > 0 or need_dx:
            dh = jax.lax.dot_general(dz, w, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if i > 0:
                dz = dh * jnp.where(pre[i - 1] >= 0, 1.0, 0.2)
            else:
                dz = dh
    return grads, dz


def _sweep_kernel(ccg_ref, ccd_ref, reals_ref, z1_ref, z2_ref, *refs,
                  E: int, B: int, L_g: int,
                  lr_g: float, lr_d: float, b1: float, b2: float):
    """All E interleaved (D step, G step) local iterations for ONE worker.

    ``ccg_ref``/``ccd_ref``: (1, E, 2) SMEM per-worker Adam bias
    corrections for G and D (per-worker: FeGAN partial participation makes
    step counts differ between workers).
    ``refs``: 6*L_g G-state refs + 18 D-state refs (params, mu, nu as
    (w, b) pairs, biases shaped (1, 1, h)), then the same aliased outputs,
    then the two (W, 128) loss refs."""
    n_g, n_d = 6 * L_g, 18
    n = n_g + n_d
    state_in, state_out = refs[:n], refs[n:2 * n]
    dloss_ref, gloss_ref = refs[2 * n], refs[2 * n + 1]
    vals = [r[0] for r in state_in]

    def pairs(flat):
        return [(flat[2 * i], flat[2 * i + 1]) for i in range(len(flat) // 2)]

    g_p = pairs(vals[0:2 * L_g])
    g_mu = pairs(vals[2 * L_g:4 * L_g])
    g_nu = pairs(vals[4 * L_g:6 * L_g])
    d_p = pairs(vals[n_g:n_g + 6])
    d_mu = pairs(vals[n_g + 6:n_g + 12])
    d_nu = pairs(vals[n_g + 12:n_g + 18])

    d_loss_sum = jnp.zeros((), jnp.float32)
    g_loss_sum = jnp.zeros((), jnp.float32)

    for e in range(E):                                    # static unroll
        real = reals_ref[0, e]                            # (B, 2) f32
        c1g, c2g = ccg_ref[0, e, 0], ccg_ref[0, e, 1]
        c1d, c2d = ccd_ref[0, e, 0], ccd_ref[0, e, 1]

        # ---- 1. fake batch from the CURRENT G (gradient discarded) ----
        _, _, fake = _mlp_forward(z1_ref[0, e], g_p, "tanh")

        # ---- 2. D step on (real, fake) ----
        x = jnp.concatenate([real, fake], axis=0)         # (2B, 2)
        d_pre, d_ins, p = _mlp_forward(x, d_p, "sigmoid")
        pc = jnp.clip(p, 1e-12, 1.0 - 1e-7)
        is_real = (jax.lax.broadcasted_iota(jnp.int32, (2 * B, 1), 0)
                   < B).astype(jnp.float32)
        # loss = bce(real,1) + bce(fake,0): sum over 2B rows / B
        per = -(is_real * jnp.log(pc) + (1 - is_real) * jnp.log1p(-pc))
        d_loss = jnp.sum(per) / B
        dpc = (1.0 / B) * (is_real * (-1.0 / pc)
                           + (1 - is_real) * (1.0 / (1.0 - pc)))
        inside = ((p > 1e-12) & (p < 1.0 - 1e-7)).astype(jnp.float32)
        gz = dpc * inside * p * (1.0 - p)                 # d loss / d z_last
        d_grads, _ = _mlp_backward(gz, d_pre, d_ins, d_p, need_dx=False)
        for i in range(3):
            w, b = d_p[i]
            (dw, db) = d_grads[i]
            w, mw, nw = _adam(w, d_mu[i][0], d_nu[i][0], dw, c1d, c2d,
                              lr_d, b1, b2)
            b, mb, nb = _adam(b, d_mu[i][1], d_nu[i][1], db, c1d, c2d,
                              lr_d, b1, b2)
            d_p[i], d_mu[i], d_nu[i] = (w, b), (mw, mb), (nw, nb)

        # ---- 3. G step through the UPDATED D ----
        g_pre, g_ins, fake2 = _mlp_forward(z2_ref[0, e], g_p, "tanh")
        d2_pre, d2_ins, p2 = _mlp_forward(fake2, d_p, "sigmoid")
        pc2 = jnp.clip(p2, 1e-12, 1.0 - 1e-7)
        g_loss = -jnp.sum(jnp.log(pc2)) / B               # bce(p2, 1)
        dpc2 = (-1.0 / B) / pc2
        inside2 = ((p2 > 1e-12) & (p2 < 1.0 - 1e-7)).astype(jnp.float32)
        gz2 = dpc2 * inside2 * p2 * (1.0 - p2)
        _, dfake = _mlp_backward(gz2, d2_pre, d2_ins, d_p, need_dx=True)
        # through the G tanh: d/dz = 1 - tanh(z)^2 = 1 - fake2^2
        gzg = dfake * (1.0 - fake2 * fake2)
        g_grads, _ = _mlp_backward(gzg, g_pre, g_ins, g_p, need_dx=False)
        for i in range(L_g):
            w, b = g_p[i]
            (dw, db) = g_grads[i]
            w, mw, nw = _adam(w, g_mu[i][0], g_nu[i][0], dw, c1g, c2g,
                              lr_g, b1, b2)
            b, mb, nb = _adam(b, g_mu[i][1], g_nu[i][1], db, c1g, c2g,
                              lr_g, b1, b2)
            g_p[i], g_mu[i], g_nu[i] = (w, b), (mw, mb), (nw, nb)

        d_loss_sum = d_loss_sum + d_loss
        g_loss_sum = g_loss_sum + g_loss

    flat = []
    for group in (g_p, g_mu, g_nu, d_p, d_mu, d_nu):
        for w, b in group:
            flat.extend([w, b])
    for ref, val in zip(state_out, flat):
        ref[0] = val
    i = pl.program_id(0)
    ones = jnp.ones((1, 128), jnp.float32)
    dloss_ref[pl.ds(i, 1), :] = (d_loss_sum / E) * ones
    gloss_ref[pl.ds(i, 1), :] = (g_loss_sum / E) * ones


def eligible(cfg, mesh) -> bool:
    """Whether the fused sweep may replace the FedAvg-family local phase:
    2DMG "batches" sweep (uniform per-round step counts; the MNIST
    generators' BatchNorm state cannot live in VMEM), f32, single-chip, no
    dropout.  Auto (``cfg.pallas_sweep is None``) resolves to **False**:
    the kernel measured 0.78-0.95x the XLA path at every epoch count (see
    the module docstring) — it runs only when forced with
    ``pallas_sweep=True`` (numerics-parity testing, future re-evaluation
    on other TPU generations)."""
    if cfg.pallas_sweep is not True:
        return False
    ok = (cfg.algo in ("flgan", "fegan") and cfg.dataset == "2dmg"
          and not cfg.conv and cfg.dtype == "float32" and mesh is None
          and cfg.dropout_rate == 0.0
          and cfg.resolved_local_sweep == "batches"
          # the kernel hardcodes a sigmoid+BCE loss; a library caller's
          # d_head override would silently diverge without this gate
          and cfg.resolved_d_head == "sigmoid"
          # the kernel statically unrolls all E iterations -> O(E) Mosaic
          # program; cap forced compiles at a sane bound
          and cfg.epoch <= 32)
    if not ok:
        raise ValueError(
            "pallas_sweep=True requires a 2DMG flgan/fegan config with "
            "float32, a sigmoid D head, epoch <= 32 (the kernel unrolls "
            "all E local iterations), no --devices mesh and no dropout")
    return True


def kernel_sweep_phase(g_net, d_net, shards, starts, z1, z2, cfg):
    """Drop-in FedAvg-family local phase over FLAT (W, ...) stacked
    NetStates (params pre-broadcast per worker).

    shards: (W, L, 2); starts: (E,) shared window offsets; z1/z2:
    (W, E, B, zdim) pre-drawn latents matching _local_sweep's PRNG order.
    Returns (new_g_net, new_d_net, d_loss (W,), g_loss (W,))."""
    B, E = cfg.batch_size, cfg.epoch
    reals = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(shards, starts[e], B, axis=1)
         for e in range(E)], axis=1)                      # (W, E, B, 2)
    gp, gmu, gnu, gcount = unpack_net_generic(g_net)
    dp, dmu, dnu, dcount = unpack_net_generic(d_net)
    new_gp, new_gmu, new_gnu, new_dp, new_dmu, new_dnu, dl, gl = \
        fused_sweep_steps(gp, gmu, gnu, gcount, dp, dmu, dnu, dcount,
                          reals, z1, z2, lr_g=cfg.lr_g, lr_d=cfg.lr_d,
                          b1=cfg.b1, b2=cfg.b2)
    return (repack_net_generic(g_net, new_gp, new_gmu, new_gnu, gcount + E),
            repack_net_generic(d_net, new_dp, new_dmu, new_dnu, dcount + E),
            dl, gl)


def fused_sweep_steps(g_p: Tuple, g_mu: Tuple, g_nu: Tuple, g_count,
                      d_p: Tuple, d_mu: Tuple, d_nu: Tuple, d_count,
                      reals, z1, z2, *, lr_g: float = 2e-4,
                      lr_d: float = 2e-4, b1: float = 0.5, b2: float = 0.999,
                      interpret=None):
    """Run E interleaved (D step, G step) iterations for W workers in one
    kernel.

    g_p/g_mu/g_nu: flat per-layer (w, b) tensor lists, each stacked (W, ...);
    d_* likewise (always 3 layers).  g_count/d_count: (W,) (or scalar)
    int32 per-worker Adam counts, pre-increment.  reals: (W, E, B, 2) f32;
    z1/z2: (W, E, B, zdim).

    Returns (new_g_p, new_g_mu, new_g_nu, new_d_p, new_d_mu, new_d_nu,
    d_loss (W,), g_loss (W,)); the 6 state lists alias in place.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    W, E, B, _ = reals.shape
    L_g = len(g_p) // 2

    def lift(flat):
        return [t if t.ndim == 3 else t[:, None, :] for t in flat]

    tensors = (lift(list(g_p)) + lift(list(g_mu)) + lift(list(g_nu))
               + lift(list(d_p)) + lift(list(d_mu)) + lift(list(d_nu)))
    n = len(tensors)
    assert n == 6 * L_g + 18

    def state_spec(x):
        return pl.BlockSpec((1,) + x.shape[1:],
                            lambda i: (i,) + (0,) * (x.ndim - 1),
                            memory_space=pltpu.VMEM)

    def batch_spec(x):
        return pl.BlockSpec((1,) + x.shape[1:], lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    cc_spec = pl.BlockSpec((1, E, 2), lambda i: (i, 0, 0),
                           memory_space=pltpu.SMEM)
    in_specs = (
        [cc_spec, cc_spec]                               # cc_g, cc_d
        + [batch_spec(reals), batch_spec(z1), batch_spec(z2)]
        + [state_spec(t) for t in tensors]
    )
    loss_spec = pl.BlockSpec((W, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    out_specs = tuple([state_spec(t) for t in tensors]
                      + [loss_spec, loss_spec])
    out_shape = tuple(
        [jax.ShapeDtypeStruct(t.shape, t.dtype) for t in tensors]
        + [jax.ShapeDtypeStruct((W, 128), jnp.float32)] * 2)

    kernel = functools.partial(
        _sweep_kernel, E=E, B=B, L_g=L_g,
        lr_g=lr_g, lr_d=lr_d, b1=b1, b2=b2)

    state_bytes = sum(int(np.prod(t.shape[1:])) * 4 for t in tensors)
    act_bytes = (E * B * (2 + 2 * z1.shape[-1])) * 4 + 10 * (2 * B * 256) * 4
    outs = pl.pallas_call(
        kernel,
        grid=(W,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        # state tensors are inputs 5..5+n-1 -> outputs 0..n-1, in place
        input_output_aliases={5 + j: j for j in range(n)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(128 * 1024 * 1024,
                                 2 * (state_bytes + act_bytes) + (1 << 20))),
        interpret=interpret,
    )(_bias_corrections(g_count, W, E, b1, b2),
      _bias_corrections(d_count, W, E, b1, b2),
      reals, z1, z2, *tensors)

    def drop(ts, ref):
        return [t if r.ndim == 3 else t[:, 0, :] for t, r in zip(ts, ref)]

    new = outs[:n]
    dl, gl = outs[n][:, 0], outs[n + 1][:, 0]
    m = 2 * L_g
    return (drop(new[0:m], g_p), drop(new[m:2 * m], g_mu),
            drop(new[2 * m:3 * m], g_nu),
            drop(new[3 * m:3 * m + 6], d_p),
            drop(new[3 * m + 6:3 * m + 12], d_mu),
            drop(new[3 * m + 12:3 * m + 18], d_nu), dl, gl)
