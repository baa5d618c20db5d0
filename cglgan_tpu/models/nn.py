"""Minimal functional NN core.

Plain pytree parameters + pure apply functions (no flax): stacked-per-client
parameter trees vmap cleanly, and hot paths can later be swapped for Pallas
kernels without framework friction.

Initialisation matches torch defaults so trajectories are comparable with the
reference:
* ``nn.Linear``: weight & bias ~ U(-1/sqrt(fan_in), +1/sqrt(fan_in))
  (kaiming_uniform(a=sqrt(5)) reduces to exactly this bound).
* ``nn.Conv2d``: same bound with fan_in = in_ch * kh * kw.
* ``weights_init`` DCGAN N(0, 0.02) re-init (reference capgan.py:63-72,
  mixed-gan.py applies it to G; fegan.py:83-92 defines it).

BatchNorm reproduces the reference's ``BatchNorm1d(out, 0.8)`` quirk: the
positional 0.8 is **eps**, not momentum (model/mnist_model.py:13) — momentum
stays at torch's default 0.1.  Running stats use the unbiased variance, as
torch does.
"""
from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict
State = Dict

# torch's BatchNorm default momentum; the reference's positional 0.8 is eps,
# not momentum (model/mnist_model.py:13).  Exposed as a constant so round
# code can compose multi-forward running-stat updates in closed form.
BN_MOMENTUM = 0.1

# ---------------------------------------------------------------------------
# layer init
# ---------------------------------------------------------------------------

def linear_init(key, din: int, dout: int, dtype=jnp.float32) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(din)
    return {
        "w": jax.random.uniform(kw, (din, dout), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (dout,), dtype, -bound, bound),
    }


def conv_init(key, cin: int, cout: int, k: int, dtype=jnp.float32) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin * k * k)
    return {
        "w": jax.random.uniform(kw, (cout, cin, k, k), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (cout,), dtype, -bound, bound),
    }


def bn_init(dim: int, dtype=jnp.float32) -> Tuple[Params, State]:
    params = {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}
    state = {"mean": jnp.zeros((dim,), dtype), "var": jnp.ones((dim,), dtype)}
    return params, state


def dcgan_reinit(key, params: Params) -> Params:
    """Re-initialise a param tree DCGAN-style, matching the reference
    weights_init exactly (capgan.py:63-72): Linear weight N(0,0.02) + bias 0;
    Conv weight N(0,0.02) with bias left at its default init (the torch hook
    only touches m.weight for Conv); BN scale N(1,0.02) + bias 0.  Conv vs
    linear biases are told apart by the sibling weight's rank (conv w is
    4-D OIHW)."""
    flat, treedef = jax.tree.flatten_with_path(params)
    # rank of the sibling "w" for each dict level, to classify its "b"
    w_rank = {}
    for path, leaf in flat:
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "w":
            w_rank[path[:-1]] = leaf.ndim
    keys = jax.random.split(key, len(flat))
    out = []
    for (path, leaf), k in zip(flat, keys):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "w":
            out.append(0.02 * jax.random.normal(k, leaf.shape, leaf.dtype))
        elif name == "scale":
            out.append(1.0 + 0.02 * jax.random.normal(k, leaf.shape,
                                                      leaf.dtype))
        elif name == "b" and w_rank.get(path[:-1], 2) == 4:
            out.append(leaf)             # conv bias: untouched
        else:  # linear bias / BN bias
            out.append(jnp.zeros_like(leaf))
    return jax.tree.unflatten(treedef, out)


# ---------------------------------------------------------------------------
# layer apply
# ---------------------------------------------------------------------------

def linear(p: Params, x):
    return x @ p["w"] + p["b"]


def leaky_relu(x, slope: float = 0.2):
    return jnp.where(x >= 0, x, slope * x)


def conv2d(p: Params, x, stride: int = 1, padding: int = 1):
    """NCHW conv with OIHW weights, matching torch.nn.Conv2d."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + p["b"][None, :, None, None]


def upsample2x(x):
    """Nearest-neighbour 2x upsample on NCHW (torch nn.Upsample default)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)


def batchnorm(p: Params, s: State, x, train: bool, eps: float = 0.8,
              momentum: float = BN_MOMENTUM) -> Tuple[jax.Array, State]:
    """BatchNorm over all axes but the channel axis.

    1-D inputs (B, C) normalise over B; 2-D image inputs (B, C, H, W)
    normalise over (B, H, W).  ``eps`` defaults to the reference's 0.8 quirk.
    """
    if x.ndim == 2:
        axes = (0,)
        shape = (1, -1)
    else:
        axes = (0, 2, 3)
        shape = (1, -1, 1, 1)
    if train:
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        count = x.size // x.shape[1]
        unbiased = var * count / max(count - 1, 1)
        new_s = {
            "mean": (1 - momentum) * s["mean"] + momentum * mean,
            "var": (1 - momentum) * s["var"] + momentum * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean.reshape(shape)) * inv.reshape(shape)
    return y * p["scale"].reshape(shape) + p["bias"].reshape(shape), new_s


def dropout2d(key, x, rate: float, train: bool):
    """Channel-wise dropout on NCHW (torch nn.Dropout2d)."""
    if not train or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, (x.shape[0], x.shape[1], 1, 1))
    return x * keep / (1.0 - rate)
