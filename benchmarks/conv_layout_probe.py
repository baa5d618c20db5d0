"""NCHW vs NHWC layout for the conv LSGAN family on TPU.

The conv pair (model/lsgan.py parity; zoo `conv`/`conv-multipath`) is the
one model path whose hot ops never had a layout pass: `nn.conv2d` uses
torch's NCHW/OIHW (models/nn.py:106-111) for weight-transplant parity.
XLA:TPU internally prefers channels-minor layouts; NCHW inputs can force
transposes around every conv.  This probe measures the *pure conv math*
both ways on the real chip:

* D path: conv-D forward + backward (the per-client hot op in mdgan-conv)
* G path: conv-G forward (linear -> 2x(up+conv+bn+lrelu) -> conv+tanh)

Both layouts compute the identical math (weights transposed OIHW->HWIO
outside the timed region, as they would be stored natively if adopted);
max |delta| is printed as a sanity check.  Run:

    python -m benchmarks.conv_layout_probe
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cglgan_tpu.models import nn
from cglgan_tpu.models import zoo

B = 100
STEPS = 200


# --------------------------------------------------------------------------
# NHWC twins of the nn.py NCHW primitives
# --------------------------------------------------------------------------

def conv2d_nhwc(p, x, stride=1, padding=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


def upsample2x_nhwc(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def bn_nhwc(p, s, x, train=True, eps=0.8):
    # same math as nn.batchnorm (eps 0.8 quirk) on a channels-last tensor;
    # batch stats only (running-stat update is unused in the probe and DCE'd
    # identically in both layouts)
    mean = x.mean((0, 1, 2))
    var = x.var((0, 1, 2))
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * inv
    return y * p["scale"] + p["bias"], s


def to_hwio(tree_nchw):
    def cv(v):
        if isinstance(v, dict) and "w" in v and v["w"].ndim == 4:
            return {"w": jnp.transpose(v["w"], (2, 3, 1, 0)), "b": v["b"]}
        return v
    return jax.tree.map(cv, tree_nchw,
                        is_leaf=lambda v: isinstance(v, dict) and "w" in v)


def bn_nchw_stats_only(p, x, eps=0.8):
    mean = x.mean((0, 2, 3))
    var = x.var((0, 2, 3))
    inv = jax.lax.rsqrt(var + eps)
    shape = (1, -1, 1, 1)
    y = (x - mean.reshape(shape)) * inv.reshape(shape)
    return y * p["scale"].reshape(shape) + p["bias"].reshape(shape)


def d_apply_nhwc(params, x):
    # mirrors zoo._conv_d_apply without dropout (a layout-independent
    # elementwise mask, excluded from both paths)
    x = conv2d_nhwc(params["c1"], x, stride=2)
    x = nn.leaky_relu(x)
    for i in (2, 3, 4):
        x = conv2d_nhwc(params[f"c{i}"], x, stride=2)
        x = nn.leaky_relu(x)
        x, _ = bn_nhwc(params[f"bn{i}"], None, x)
    # pivot back so the flatten order matches the NCHW adv weights (a real
    # NHWC adoption would permute the adv weight rows once at init instead)
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
    return nn.linear(params["adv"], x)


def d_apply_nchw(params, x):
    x = nn.conv2d(params["c1"], x, stride=2)
    x = nn.leaky_relu(x)
    for i in (2, 3, 4):
        x = nn.conv2d(params[f"c{i}"], x, stride=2)
        x = nn.leaky_relu(x)
        x = bn_nchw_stats_only(params[f"bn{i}"], x)
    x = x.reshape(x.shape[0], -1)
    return nn.linear(params["adv"], x)


def g_apply_nchw(params, z):
    x = nn.linear(params["l1"], z).reshape(z.shape[0], 128, 8, 8)
    x = nn.upsample2x(x)
    x = nn.conv2d(params["c1"], x)
    x = bn_nchw_stats_only(params["bn1"], x)
    x = nn.leaky_relu(x)
    x = nn.upsample2x(x)
    x = nn.conv2d(params["c2"], x)
    x = bn_nchw_stats_only(params["bn2"], x)
    x = nn.leaky_relu(x)
    return jnp.tanh(nn.conv2d(params["c3"], x))


def g_apply_nhwc(params, z):
    x = nn.linear(params["l1"], z).reshape(z.shape[0], 128, 8, 8)
    x = jnp.transpose(x, (0, 2, 3, 1))   # the one layout pivot, 8x8 small
    x = upsample2x_nhwc(x)
    x = conv2d_nhwc(params["c1"], x)
    x, _ = bn_nhwc(params["bn1"], None, x)
    x = nn.leaky_relu(x)
    x = upsample2x_nhwc(x)
    x = conv2d_nhwc(params["c2"], x)
    x, _ = bn_nhwc(params["bn2"], None, x)
    x = nn.leaky_relu(x)
    return jnp.tanh(conv2d_nhwc(params["c3"], x))


# --------------------------------------------------------------------------
# timing harness: scan STEPS iterations inside one jit
# --------------------------------------------------------------------------

def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (reps * STEPS) * 1e3  # ms/step


def scan_grads(apply_fn, loss_is_d):
    def loss(p, x):
        y = apply_fn(p, x)
        return jnp.mean((y - 1.0) ** 2) if loss_is_d else jnp.mean(y ** 2)

    @jax.jit
    def run(p, x):
        def body(p, _):
            g = jax.grad(loss)(p, x)
            return jax.tree.map(lambda a, b: a - 1e-4 * b, p, g), None
        return jax.lax.scan(body, p, None, length=STEPS)[0]
    return run


def main():
    key = jax.random.key(0)
    dp, _ = zoo._conv_d_init(key)
    gp, _ = zoo._conv_g_init(key)
    x_nchw = jax.random.normal(jax.random.key(1), (B, 1, 32, 32))
    x_nhwc = jnp.transpose(x_nchw, (0, 2, 3, 1))
    z = jax.random.normal(jax.random.key(2), (B, 100))
    dp_hwio = to_hwio(dp)
    gp_hwio = to_hwio(gp)

    # numerics sanity
    d_delta = jnp.max(jnp.abs(d_apply_nchw(dp, x_nchw)
                              - d_apply_nhwc(dp_hwio, x_nhwc)))
    g_delta = jnp.max(jnp.abs(g_apply_nchw(gp, z)
                              - jnp.transpose(g_apply_nhwc(gp_hwio, z),
                                              (0, 3, 1, 2))))
    print(f"max |D delta| {float(d_delta):.2e}  |G delta| {float(g_delta):.2e}")

    rows = [
        ("D fwd+bwd NCHW", scan_grads(d_apply_nchw, True), dp, x_nchw),
        ("D fwd+bwd NHWC", scan_grads(d_apply_nhwc, True), dp_hwio, x_nhwc),
        ("G fwd+bwd NCHW", scan_grads(g_apply_nchw, False), gp, z),
        ("G fwd+bwd NHWC", scan_grads(g_apply_nhwc, False), gp_hwio, z),
    ]
    ms = {}
    for name, fn, p, a in rows:
        ms[name] = timed(fn, p, a)
        print(f"{name:18s} {ms[name]:8.4f} ms/step")
    print(f"D speedup NHWC: {ms['D fwd+bwd NCHW'] / ms['D fwd+bwd NHWC']:.2f}x")
    print(f"G speedup NHWC: {ms['G fwd+bwd NCHW'] / ms['G fwd+bwd NHWC']:.2f}x")


if __name__ == "__main__":
    main()
