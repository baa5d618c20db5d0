"""FID and Inception Score for the image workloads.

Reference protocol (FLGAN/MNIST/flgan.py:62-104, MDGAN/MNIST/mdgan.py:63-104):
every 500 rounds, 100-image subsamples of real and generated data are
bilinear-resized to 299^2, channel-tripled and scored with pytorch-ignite's
FID + InceptionScore (InceptionV3 features).

This image has no torchvision and no network egress, so InceptionV3 weights
cannot exist here.  The same *metric machinery* is provided over a pluggable
feature extractor:

* ``conv_feature_extractor`` — a fixed-seed random convolutional embedding
  (deterministic across runs).  Frechet distances over random conv features
  are a standard proxy that preserves relative ordering of generative models;
  absolute values are NOT comparable to Inception-based FID.
* ``classifier_probe`` — a small CNN trained on the real dataset in seconds,
  used both as a learned feature space for FID and as the class-probability
  model for the Inception Score.
* Real Inception weights, if ever present on disk, can be wrapped in the
  same ``(params, apply)`` contract and passed straight in.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cglgan_tpu.models import nn as fnn


class Extractor(NamedTuple):
    params: any
    apply: Callable  # (params, images_nchw_float) -> (N, feat_dim)


# ---------------------------------------------------------------------------
# feature spaces
# ---------------------------------------------------------------------------

def conv_feature_extractor(img_size: int = 28, feat_dim: int = 256,
                           seed: int = 20211212) -> Extractor:
    """3 stride-2 conv blocks + global pooling + fixed projection, all with
    frozen N(0, sigma) weights (He-scaled)."""
    key = jax.random.key(seed)
    ks = jax.random.split(key, 4)
    chans = [(1, 32), (32, 64), (64, 128)]
    params = {}
    for i, (cin, cout) in enumerate(chans):
        w = jax.random.normal(ks[i], (cout, cin, 3, 3)) * np.sqrt(2.0 / (cin * 9))
        params[f"c{i}"] = {"w": w, "b": jnp.zeros((cout,))}
    params["proj"] = jax.random.normal(ks[3], (128, feat_dim)) / np.sqrt(128)

    def apply(params, x):
        for i in range(3):
            x = fnn.conv2d(params[f"c{i}"], x, stride=2)
            x = fnn.leaky_relu(x, 0.2)
        x = jnp.mean(x, axis=(2, 3))            # global average pool
        return x @ params["proj"]

    return Extractor(params, apply)


def classifier_probe(images_u8: np.ndarray, labels: np.ndarray,
                     num_class: int = 10, steps: int = 500,
                     batch: int = 256, seed: int = 0) -> Extractor:
    """Train a small CNN classifier on the real data; its penultimate layer is
    the FID feature space and its softmax the IS class model.  Returns an
    Extractor whose apply gives (features, logits) concatenated —
    use ``split_probe_output``.  Works for any square image side (the two
    stride-2 convs flatten to 64*(side//4)^2)."""
    import optax

    side = int(images_u8.shape[-1])
    flat = 64 * (side // 4) ** 2
    key = jax.random.key(seed)
    ks = jax.random.split(key, 5)
    params = {
        "c0": fnn.conv_init(ks[0], 1, 32, 3),
        "c1": fnn.conv_init(ks[1], 32, 64, 3),
        "l0": fnn.linear_init(ks[2], flat, 128),
        "l1": fnn.linear_init(ks[3], 128, num_class),
    }

    def net(params, x):
        x = fnn.leaky_relu(fnn.conv2d(params["c0"], x, stride=2))
        x = fnn.leaky_relu(fnn.conv2d(params["c1"], x, stride=2))
        x = x.reshape(x.shape[0], -1)
        feat = fnn.leaky_relu(fnn.linear(params["l0"], x))
        return feat, fnn.linear(params["l1"], feat)

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    data = jnp.asarray(images_u8)
    labs = jnp.asarray(labels)

    @jax.jit
    def step(params, opt_state, k):
        idx = jax.random.randint(k, (batch,), 0, data.shape[0])
        x = (data[idx].astype(jnp.float32) / 255.0 - 0.5) / 0.5
        x = x[:, None, :, :]
        y = labs[idx]

        def loss_fn(p):
            _, logits = net(p, x)
            return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(batch), y])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        ups, opt_state2 = opt.update(grads, opt_state)
        return optax.apply_updates(params, ups), opt_state2, loss

    k = jax.random.key(seed + 1)
    for i in range(steps):
        k, sub = jax.random.split(k)
        params, opt_state, loss = step(params, opt_state, sub)

    def apply(params, x):
        feat, logits = net(params, x)
        return jnp.concatenate([feat, logits], axis=-1)

    return Extractor(params, apply)


def split_probe_output(out, num_class: int = 10):
    return out[:, :-num_class], out[:, -num_class:]


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("apply",))
def _features(apply, params, images):
    return apply(params, images)


def activation_stats(extractor: Extractor, images,
                     batch: int = 100) -> Tuple[np.ndarray, np.ndarray]:
    """images: float NCHW in [-1, 1].  Returns (mu, cov) on host.

    Features are extracted in ``batch``-sized minibatches (the reference's
    own tick size, FLGAN/MNIST/flgan.py:89) so large eval pools don't
    materialise e.g. (N, 3, 299, 299) Inception activations at once."""
    images = jnp.asarray(images)
    n = images.shape[0]
    chunks = []
    for i in range(0, n, batch):
        chunks.append(np.asarray(_features(
            extractor.apply, extractor.params, images[i:i + batch])))
    f = np.concatenate(chunks, axis=0)
    mu = f.mean(0)
    cov = np.cov(f, rowvar=False)
    return mu, cov


def frechet_distance(mu1, cov1, mu2, cov2) -> float:
    """Frechet distance between two Gaussians (the FID formula)."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean = linalg.sqrtm(np.atleast_2d(cov1) @ np.atleast_2d(cov2))
    if isinstance(covmean, tuple):       # older scipy returns (sqrtm, errest)
        covmean = covmean[0]
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2)
                 - 2.0 * np.trace(covmean))


def fid(extractor: Extractor, generated, real) -> float:
    """generated/real: float NCHW in [-1, 1] (the reference subsamples 100 of
    each per tick, FLGAN/MNIST/flgan.py:89-98)."""
    mu_g, cov_g = activation_stats(extractor, generated)
    mu_r, cov_r = activation_stats(extractor, real)
    return frechet_distance(mu_g, cov_g, mu_r, cov_r)


def inception_score(probe: Extractor, generated, num_class: int = 10,
                    eps: float = 1e-12) -> float:
    """IS = exp(E_x KL(p(y|x) || p(y))) over the probe's class posterior."""
    out = np.asarray(_features(probe.apply, probe.params,
                               jnp.asarray(generated)))
    _, logits = split_probe_output(out, num_class)
    p = np.exp(logits - logits.max(1, keepdims=True))
    p /= p.sum(1, keepdims=True)
    marginal = p.mean(0)
    kl = (p * (np.log(p + eps) - np.log(marginal + eps))).sum(1).mean()
    return float(np.exp(kl))
