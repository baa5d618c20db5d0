"""Model zoo: every G/D family the reference defines, as functional pytrees.

Reference model inventory covered here (SURVEY.md §2.1 C3-C8):

* 2DMG MLP G 100-32-2+Tanh            (ACGAN/2DMG/model.py:4-20)
* 2DMG MLP G 100-256-128-2+Tanh       (FLGAN/2DMG/model.py:4-20, MDGAN same)
* 2DMG multi-path G trunk 100-32, N heads 32-2+Tanh (CGLGAN/2DMG/model.py:26-50)
* 2DMG D 2-128-256-1+Sigmoid          (ACGAN/2DMG/model.py:25-41 et al.)
* MNIST MLP G 100-128-256(BN)-512(BN)-1024(BN)-784+Tanh, BN eps 0.8,
  LeakyReLU 0.2                       (model/mnist_model.py:5-29)
* MNIST multi-path G trunk ..512, N heads 512-1024(BN)-784+Tanh
  (model/mnist_model.py:32-66, CGLGAN/MNIST/mnist_model.py:30-64)
* MNIST D 784-512-256-1+Sigmoid       (ACGAN/MNIST/mnist_model.py:33-50)
  or 784-512-256-2 raw logits for CE  (model/mnist_model.py:71-88)
* Conv LSGAN G / MixG / D             (model/lsgan.py:3-98); the reference
  MixGenerator references a missing ``self.img_shape`` (lsgan.py:68) — a
  latent bug we fix rather than replicate (SURVEY.md §7.3.6).

Multi-path generators stack the N per-client heads on a leading axis and
``vmap`` over it — the reference's Python loop over ``self.paths``
(model/mnist_model.py:59-66) becomes one batched matmul per layer.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cglgan_tpu.models import nn


# ---------------------------------------------------------------------------
# declarative MLP machinery
# ---------------------------------------------------------------------------
# spec entries: ("linear", din, dout) | ("bn", dim) | ("lrelu", slope)
#             | ("tanh",) | ("sigmoid",)

def mlp_init(key, spec, dtype=jnp.float32):
    params, state = [], []
    for entry in spec:
        if entry[0] == "linear":
            key, sub = jax.random.split(key)
            params.append(nn.linear_init(sub, entry[1], entry[2], dtype))
            state.append(None)
        elif entry[0] == "bn":
            p, s = nn.bn_init(entry[1], dtype)
            params.append(p)
            state.append(s)
        else:
            params.append(None)
            state.append(None)
    return params, state


def mlp_apply(spec, params, state, x, train: bool):
    new_state = list(state)
    for i, entry in enumerate(spec):
        op = entry[0]
        if op == "linear":
            x = nn.linear(params[i], x)
        elif op == "bn":
            x, new_state[i] = nn.batchnorm(params[i], state[i], x, train)
        elif op == "lrelu":
            x = nn.leaky_relu(x, entry[1])
        elif op == "tanh":
            x = jnp.tanh(x)
        elif op == "sigmoid":
            x = jax.nn.sigmoid(x)
    return x, new_state


def _block(din, dout, bn=True):
    out = [("linear", din, dout)]
    if bn:
        out.append(("bn", dout))
    out.append(("lrelu", 0.2))
    return out


# ---------------------------------------------------------------------------
# model containers
# ---------------------------------------------------------------------------

class Model(NamedTuple):
    """A functional model: ``init(key) -> (params, state)`` and
    ``apply(params, state, x, train, rng=None) -> (y, new_state)``.

    For multi-path generators ``apply`` returns (N, B, *img) — head i's output
    is routed to client i (reference mixed-gan.py:242-252)."""
    init: Callable
    apply: Callable
    multipath: bool = False
    out_dim: int = 1          # discriminator head width (1 sigmoid / 2 logits)


def _mlp_model(spec, out_shape=None):
    def init(key, dtype=jnp.float32):
        return mlp_init(key, spec, dtype)

    def apply(params, state, x, train=True, rng=None):
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        y, new_state = mlp_apply(spec, params, state, x, train)
        if out_shape is not None:
            y = y.reshape((y.shape[0],) + tuple(out_shape))
        return y, new_state

    return init, apply


def _multipath_model(trunk_spec, head_spec, num_heads, out_shape=None):
    def init(key, dtype=jnp.float32):
        kt, kh = jax.random.split(key)
        tp, ts = mlp_init(kt, trunk_spec, dtype)
        hp, hs = jax.vmap(lambda k: mlp_init(k, head_spec, dtype))(
            jax.random.split(kh, num_heads))
        return {"trunk": tp, "heads": hp}, {"trunk": ts, "heads": hs}

    def apply(params, state, z, train=True, rng=None):
        hidden, new_ts = mlp_apply(trunk_spec, params["trunk"], state["trunk"],
                                   z, train)
        head = lambda p, s: mlp_apply(head_spec, p, s, hidden, train)
        y, new_hs = jax.vmap(head)(params["heads"], state["heads"])
        if out_shape is not None:
            y = y.reshape(y.shape[:2] + tuple(out_shape))
        return y, {"trunk": new_ts, "heads": new_hs}

    return init, apply


# ---------------------------------------------------------------------------
# conv LSGAN family (model/lsgan.py) — 32x32 images
# ---------------------------------------------------------------------------

_CONV_TRUNK_BN = [("bn", 128), ("bn", 64)]


def _conv_g_init(key, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {"l1": nn.linear_init(k1, 100, 128 * 8 * 8, dtype),
         "c1": nn.conv_init(k2, 128, 128, 3, dtype),
         "c2": nn.conv_init(k3, 128, 64, 3, dtype),
         "c3": nn.conv_init(k4, 64, 1, 3, dtype)}
    bn1p, bn1s = nn.bn_init(128, dtype)
    bn2p, bn2s = nn.bn_init(64, dtype)
    p["bn1"], p["bn2"] = bn1p, bn2p
    return p, {"bn1": bn1s, "bn2": bn2s}


def _conv_g_apply(params, state, z, train=True, rng=None):
    x = nn.linear(params["l1"], z).reshape(z.shape[0], 128, 8, 8)
    x = nn.upsample2x(x)
    x = nn.conv2d(params["c1"], x)
    x, s1 = nn.batchnorm(params["bn1"], state["bn1"], x, train)
    x = nn.leaky_relu(x)
    x = nn.upsample2x(x)
    x = nn.conv2d(params["c2"], x)
    x, s2 = nn.batchnorm(params["bn2"], state["bn2"], x, train)
    x = nn.leaky_relu(x)
    x = jnp.tanh(nn.conv2d(params["c3"], x))
    return x, {"bn1": s1, "bn2": s2}


def _conv_mixg_init(num_heads):
    def init(key, dtype=jnp.float32):
        k1, k2, k3, kh = jax.random.split(key, 4)
        trunk = {"l1": nn.linear_init(k1, 100, 128 * 8 * 8, dtype),
                 "c1": nn.conv_init(k2, 128, 128, 3, dtype),
                 "c2": nn.conv_init(k3, 128, 64, 3, dtype)}
        bn1p, bn1s = nn.bn_init(128, dtype)
        trunk["bn1"] = bn1p

        def head_init(k):
            hk1, = jax.random.split(k, 1)
            hbn_p, hbn_s = nn.bn_init(64, dtype)
            return ({"bn": hbn_p, "c": nn.conv_init(hk1, 64, 1, 3, dtype)},
                    {"bn": hbn_s})

        hp, hs = jax.vmap(head_init)(jax.random.split(kh, num_heads))
        return {"trunk": trunk, "heads": hp}, {"trunk": {"bn1": bn1s}, "heads": hs}
    return init


def _conv_mixg_apply(params, state, z, train=True, rng=None):
    t = params["trunk"]
    x = nn.linear(t["l1"], z).reshape(z.shape[0], 128, 8, 8)
    x = nn.upsample2x(x)
    x = nn.conv2d(t["c1"], x)
    x, s1 = nn.batchnorm(t["bn1"], state["trunk"]["bn1"], x, train)
    x = nn.leaky_relu(x)
    x = nn.upsample2x(x)
    hidden = nn.conv2d(t["c2"], x)

    def head(p, s):
        h, hs = nn.batchnorm(p["bn"], s["bn"], hidden, train)
        h = nn.leaky_relu(h)
        return jnp.tanh(nn.conv2d(p["c"], h)), {"bn": hs}

    y, new_hs = jax.vmap(head)(params["heads"], state["heads"])
    return y, {"trunk": {"bn1": s1}, "heads": new_hs}


def _conv_d_init(key, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    p = {"c1": nn.conv_init(ks[0], 1, 16, 3, dtype),
         "c2": nn.conv_init(ks[1], 16, 32, 3, dtype),
         "c3": nn.conv_init(ks[2], 32, 64, 3, dtype),
         "c4": nn.conv_init(ks[3], 64, 128, 3, dtype),
         "adv": nn.linear_init(ks[4], 128 * 2 * 2, 1, dtype)}
    state = {}
    for i, ch in zip((2, 3, 4), (32, 64, 128)):
        bp, bs = nn.bn_init(ch, dtype)
        p[f"bn{i}"] = bp
        state[f"bn{i}"] = bs
    return p, state


def _conv_d_apply(params, state, x, train=True, rng=None):
    if x.ndim == 2:      # flat real batches from the slice-layout data path
        side = int(x.shape[1] ** 0.5)
        x = x.reshape(x.shape[0], 1, side, side)
    if rng is None:
        rng = jax.random.key(0)
    new_state = dict(state)
    rngs = jax.random.split(rng, 4)
    x = nn.conv2d(params["c1"], x, stride=2)
    x = nn.leaky_relu(x)
    x = nn.dropout2d(rngs[0], x, 0.25, train)
    for i, ch in zip((2, 3, 4), (32, 64, 128)):
        x = nn.conv2d(params[f"c{i}"], x, stride=2)
        x = nn.leaky_relu(x)
        x = nn.dropout2d(rngs[i - 1], x, 0.25, train)
        x, new_state[f"bn{i}"] = nn.batchnorm(params[f"bn{i}"],
                                              state[f"bn{i}"], x, train)
    x = x.reshape(x.shape[0], -1)
    return nn.linear(params["adv"], x), new_state


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def _mnist_g_spec(out: int):
    return (_block(100, 128, bn=False) + _block(128, 256) +
            _block(256, 512) + _block(512, 1024) +
            [("linear", 1024, out), ("tanh",)])


_MNIST_TRUNK_SPEC = (_block(100, 128, bn=False) + _block(128, 256) +
                     _block(256, 512))


def _mnist_head_spec(out: int):
    return _block(512, 1024) + [("linear", 1024, out), ("tanh",)]


def build_generator(family: str, num_heads: int = 1,
                    img_shape: Sequence[int] = (1, 28, 28)) -> Model:
    """``family`` one of: 2dmg-small | 2dmg-mlp | 2dmg-multipath | mnist-mlp |
    mnist-multipath | conv | conv-multipath."""
    if family == "2dmg-small":
        i, a = _mlp_model([("linear", 100, 32), ("lrelu", 0.2),
                           ("linear", 32, 2), ("tanh",)])
        return Model(i, a)
    if family == "2dmg-mlp":
        i, a = _mlp_model([("linear", 100, 256), ("lrelu", 0.2),
                           ("linear", 256, 128), ("lrelu", 0.2),
                           ("linear", 128, 2), ("tanh",)])
        return Model(i, a)
    if family == "2dmg-multipath":
        i, a = _multipath_model([("linear", 100, 32), ("lrelu", 0.2)],
                                [("linear", 32, 2), ("tanh",)], num_heads)
        return Model(i, a, multipath=True)
    if family == "mnist-mlp":
        out = int(np.prod(img_shape))   # reference: np.prod(self.img_shape)
        i, a = _mlp_model(_mnist_g_spec(out), out_shape=img_shape)
        return Model(i, a)
    if family == "mnist-multipath":
        out = int(np.prod(img_shape))
        i, a = _multipath_model(_MNIST_TRUNK_SPEC, _mnist_head_spec(out),
                                num_heads, out_shape=img_shape)
        return Model(i, a, multipath=True)
    if family == "conv":
        return Model(_conv_g_init, _conv_g_apply)
    if family == "conv-multipath":
        return Model(_conv_mixg_init(num_heads), _conv_mixg_apply,
                     multipath=True)
    raise ValueError(f"unknown generator family {family!r}")


def build_discriminator(family: str, out_dim: int = 1,
                        in_dim: int = 784) -> Model:
    """``family`` one of: 2dmg | mnist | conv.  ``out_dim`` 1 => sigmoid head
    (BCE), 2 => raw logits (CrossEntropy).  conv D always returns 1 raw logit
    (lsgan.py:92-98 has no sigmoid) — use BCE-with-logits."""
    if family == "2dmg":
        spec = [("linear", 2, 128), ("lrelu", 0.2),
                ("linear", 128, 256), ("lrelu", 0.2),
                ("linear", 256, 1), ("sigmoid",)]
        i, a = _mlp_model(spec)
        return Model(i, a, out_dim=1)
    if family == "mnist":
        spec = [("linear", in_dim, 512), ("lrelu", 0.2),
                ("linear", 512, 256), ("lrelu", 0.2),
                ("linear", 256, out_dim)]
        if out_dim == 1:
            spec.append(("sigmoid",))
        i, a = _mlp_model(spec)
        return Model(i, a, out_dim=out_dim)
    if family == "conv":
        return Model(_conv_d_init, _conv_d_apply, out_dim=1)
    raise ValueError(f"unknown discriminator family {family!r}")


GEN_SPECS = ("2dmg-small", "2dmg-mlp", "2dmg-multipath", "mnist-mlp",
             "mnist-multipath", "conv", "conv-multipath")
DISC_SPECS = ("2dmg", "mnist", "conv")


def models_for_config(cfg) -> Tuple[Model, Model]:
    """Pick the (G, D) pair the corresponding reference entry script uses."""
    # CGL uses a single-path G when iid==0 (Generator(ims, N if iid != 0
    # else 1), CGLGAN/MNIST/main.py:167); Mix-G is always multi-path
    multi = cfg.algo == "mixgan" or (cfg.algo == "cglgan" and cfg.iid != 0)
    n = cfg.clients_per_server
    if cfg.conv:
        g = build_generator("conv-multipath" if multi else "conv", n)
        d = build_discriminator("conv")
        return g, d
    out_dim = 2 if cfg.resolved_d_head == "logits2" else 1
    if cfg.dataset == "2dmg":
        if multi:
            g = build_generator("2dmg-multipath", n)
        elif cfg.algo in ("flgan", "mdgan"):
            g = build_generator("2dmg-mlp")
        else:
            g = build_generator("2dmg-small")
        d = build_discriminator("2dmg")
    else:
        img_shape = (1, cfg.img_size, cfg.img_size)
        if multi:
            g = build_generator("mnist-multipath", n, img_shape)
        else:
            g = build_generator("mnist-mlp", img_shape=img_shape)
        d = build_discriminator("mnist", out_dim,
                                in_dim=int(np.prod(img_shape)))
    return g, d
