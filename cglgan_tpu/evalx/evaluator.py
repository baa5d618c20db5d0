"""The per-workload evaluator: one source of truth for tick metrics.

2DMG configs score KL / Distribution Score / mode coverage on the painter's
histogram protocol (ACGAN/2DMG/acgan.py:56-99; MD-GAN uses 32 bins,
MDGAN/2DMG/mdgan.py:69, everything else 16).  Image configs score FID and
Inception Score on 100-image subsamples per tick (FLGAN/MNIST/flgan.py:62-104)
over a pluggable feature space:

* with ``inception_weights`` — the real InceptionV3 pool3 space
  (``evalx.inception``), reference-comparable FID;
* otherwise — the documented proxy: a fixed random-conv embedding for FID and
  a probe classifier for IS (``evalx.fid``).

``fid_stats`` optionally supplies precomputed real-image activation stats
(pytorch-fid's ``.npz`` mu/sigma format) so reference FID can be computed
without shipping the real dataset through the extractor each run.

Built once per run (the probe classifier trains here); the returned callable
is cheap per tick.  Both ``runner.train`` and the CLI consume this — library
callers get the same metrics the CLI prints.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np


def make_evaluator(cfg, part, eval_n: Optional[int] = None,
                   fid_stats: Optional[str] = None,
                   inception_weights: Optional[str] = None,
                   probe_steps: int = 300) -> Callable:
    """Returns ``evaluate(runner, state) -> dict`` for the config's workload."""
    if not cfg.is_image:
        from cglgan_tpu.evalx.hist2d import (kl_and_distribution_score,
                                             mode_coverage)
        bins = 32 if cfg.algo == "mdgan" else 16
        pool = jnp.asarray(part.eval_pool)
        n = eval_n if eval_n is not None else cfg.num_sample

        def evaluate(runner, state, samples=None) -> Dict[str, float]:
            if samples is None:
                samples = runner.sample(state, n)
            kl, ds = kl_and_distribution_score(samples, pool, bins)
            return {"kl_score": float(kl),
                    "distribution_score": float(ds),
                    "mode_coverage": float(mode_coverage(samples, pool, bins))}

        return evaluate

    from cglgan_tpu.evalx.fid import (activation_stats, classifier_probe,
                                      conv_feature_extractor,
                                      frechet_distance, inception_score)

    side = cfg.img_size + 4 if cfg.conv else cfg.img_size
    n = eval_n if eval_n is not None else 100    # reference subsample size

    if inception_weights:
        from cglgan_tpu.evalx.inception import (POOL3_DIM,
                                                inception_extractor,
                                                load_inception_weights)
        extractor = inception_extractor(load_inception_weights(
            inception_weights))
        feat_dim = POOL3_DIM
    else:
        extractor = conv_feature_extractor(side)
        feat_dim = 256

    # IS always needs a class-posterior model over the workload's classes;
    # the pool3 extractor has no class head, so the probe serves both setups.
    # The flattened partition rows are label-ordered under iid=1/2 (each
    # worker holds a ~3-class window), so a head slice would miss classes
    # entirely — draw the probe's training subset with a seeded shuffle so
    # it sees every class regardless of the non-IID layout.
    data_all = part.data.reshape(-1, side, side)
    labels_all = part.labels.reshape(-1)
    sel = np.random.default_rng(cfg.seed).permutation(len(data_all))[:20000]
    probe = classifier_probe(data_all[sel], labels_all[sel],
                             cfg.num_class, steps=probe_steps)

    if fid_stats:
        from cglgan_tpu.evalx.inception import load_fid_stats
        mu_r, cov_r = load_fid_stats(fid_stats, expect_side=side)
        if mu_r.shape[0] != feat_dim:
            raise ValueError(
                f"--fid-stats has {mu_r.shape[0]}-d features but the active "
                f"extractor ({'inception-pool3' if inception_weights else 'proxy-conv'}) "
                f"emits {feat_dim}-d — pass matching stats (pool3 stats "
                "require --inception-weights)")
    else:
        real = (part.eval_pool[:n].astype(np.float32) / 255.0 - 0.5) / 0.5
        real = real.reshape(-1, 1, side, side)
        mu_r, cov_r = activation_stats(extractor, real)

    def evaluate(runner, state, samples=None) -> Dict[str, float]:
        if samples is None:
            samples = runner.sample(state, n)
        gen = np.asarray(samples).reshape(-1, 1, side, side)[:n]
        mu_g, cov_g = activation_stats(extractor, gen)
        return {"fid": frechet_distance(mu_g, cov_g, mu_r, cov_r),
                "inception_score": inception_score(probe, gen, cfg.num_class)}

    return evaluate
