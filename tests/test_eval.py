"""Evaluation metrics: 2-D histogram scores and FID/IS machinery."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cglgan_tpu.evalx.fid import (classifier_probe, conv_feature_extractor,
                                  fid, frechet_distance, inception_score,
                                  split_probe_output)
from cglgan_tpu.evalx.hist2d import (hist2d, kl_and_distribution_score,
                                     mode_coverage)


class TestHist2D:
    def test_matches_numpy_histogram2d(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1, 1, (5000, 2)).astype(np.float32)
        ours = np.asarray(hist2d(jnp.asarray(pts), bins=16))
        ref, _, _ = np.histogram2d(pts[:, 0], pts[:, 1], bins=16,
                                   range=[[-1, 1], [-1, 1]])
        np.testing.assert_allclose(ours, ref)

    def test_perfect_match_scores(self):
        rng = np.random.default_rng(1)
        pts = rng.normal(0, 0.3, (8000, 2)).astype(np.float32)
        kl, ds = kl_and_distribution_score(jnp.asarray(pts), jnp.asarray(pts))
        assert float(kl) < 1e-5
        assert float(ds) > 0.95     # only out-of-range points lost

    def test_disjoint_distributions(self):
        a = np.full((1000, 2), -0.9, np.float32)
        b = np.full((1000, 2), 0.9, np.float32)
        kl, ds = kl_and_distribution_score(jnp.asarray(a), jnp.asarray(b))
        assert float(ds) == 0.0
        cov = mode_coverage(jnp.asarray(a), jnp.asarray(b))
        assert float(cov) == 0.0


class TestFID:
    def _imgs(self, seed, n=128, shift=0.0):
        rng = np.random.default_rng(seed)
        x = rng.normal(shift, 0.3, (n, 1, 28, 28)).astype(np.float32)
        return np.clip(x, -1, 1)

    def test_fid_zero_for_identical(self):
        ex = conv_feature_extractor()
        x = self._imgs(0)
        assert abs(fid(ex, x, x)) < 1e-3

    def test_fid_orders_by_similarity(self):
        ex = conv_feature_extractor()
        real = self._imgs(0)
        close = self._imgs(1, shift=0.05)
        far = self._imgs(2, shift=0.8)
        assert fid(ex, close, real) < fid(ex, far, real)

    def test_frechet_formula(self):
        # 1-D Gaussians: d = (mu1-mu2)^2 + (s1-s2)^2
        d = frechet_distance(np.array([1.0]), np.array([[4.0]]),
                             np.array([3.0]), np.array([[1.0]]))
        assert abs(d - (4.0 + (2.0 - 1.0) ** 2)) < 1e-6

    def test_probe_classifier_and_is(self):
        from cglgan_tpu.data.mnist import synthetic_mnist
        imgs, labels = synthetic_mnist(n=3000)
        probe = classifier_probe(imgs[:, :, :], labels, steps=200)
        # probe predicts its training distribution: high IS on real data.
        # synthetic_mnist is label-sorted — shuffle so classes are balanced.
        sel = np.random.default_rng(0).permutation(len(imgs))[:500]
        x = (imgs[sel].astype(np.float32) / 255.0 - 0.5) / 0.5
        x = x[:, None, :, :]
        score_real = inception_score(probe, x)
        # degenerate generator (all-same image): IS ~ 1
        x_deg = np.repeat(x[:1], 500, axis=0)
        score_deg = inception_score(probe, x_deg)
        assert score_real > 2.0
        assert score_deg < 1.5
        assert score_real > score_deg
