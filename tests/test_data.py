import numpy as np
import pytest

from cglgan_tpu.data.gmm import gmm_dataset, gmm_modes
from cglgan_tpu.data.mnist import synthetic_mnist
from cglgan_tpu.data.partition import partition


@pytest.mark.smoke
class TestGMM:
    def test_shapes_and_sorting(self):
        data, labels = gmm_dataset(n_class=5, samples_per_class=1000)
        assert data.shape == (5000, 2)
        assert labels.shape == (5000,)
        lab = np.asarray(labels)
        assert (np.diff(lab) >= 0).all(), "labels must be sorted"

    def test_mode_geometry(self):
        # modes on the unit circle, first at (sin 0, cos 0) = (0, 1)
        modes = gmm_modes(8)
        np.testing.assert_allclose(np.linalg.norm(modes, axis=1), 1.0, atol=1e-6)
        np.testing.assert_allclose(modes[0], [0.0, 1.0], atol=1e-6)

    def test_cluster_stats(self):
        data, labels = gmm_dataset(n_class=4, samples_per_class=2000, std=0.01)
        data, labels = np.asarray(data), np.asarray(labels)
        modes = gmm_modes(4)
        for c in range(4):
            pts = data[labels == c]
            assert len(pts) > 1000  # multinomial split stays near-uniform
            np.testing.assert_allclose(pts.mean(0), modes[c], atol=0.005)
            assert 0.005 < pts.std(0).mean() < 0.02

    def test_determinism(self):
        d1, _ = gmm_dataset(3, 100, seed=7)
        d2, _ = gmm_dataset(3, 100, seed=7)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


@pytest.mark.smoke
class TestPartition:
    def _toy(self, n=3000, c=10):
        rng = np.random.default_rng(0)
        labels = rng.integers(0, c, n)
        data = rng.normal(size=(n, 2)).astype(np.float32)
        return data, labels

    def test_iid0_equal_split(self):
        data, labels = self._toy()
        p = partition(data, labels, num_workers=10, iid=0)
        assert (p.lengths == 300).all()
        # all shards disjoint: total class freq matches source
        assert p.class_freq.sum() == 3000

    def test_iid1_label_window(self):
        data, labels = self._toy()
        p = partition(data, labels, num_workers=10, iid=1, num_class=10)
        for i in range(10):
            present = set(np.nonzero(p.class_freq[i])[0].tolist())
            window = {(i - 1) % 10, i % 10, (i + 1) % 10}
            assert present <= window, f"worker {i}: {present} not in {window}"

    def test_iid2_single_run(self):
        data, labels = self._toy()
        p = partition(data, labels, num_workers=10, iid=2, num_class=10)
        for i in range(10):
            assert (p.class_freq[i] > 0).sum() == 1, "one label per worker"

    def test_padding_wraps_real_samples(self):
        data, labels = self._toy()
        p = partition(data, labels, num_workers=10, iid=1)
        i = int(np.argmin(p.lengths))
        L = int(p.lengths[i])
        if L < p.data.shape[1]:
            np.testing.assert_array_equal(p.data[i, L], p.data[i, 0])

    def test_beta_weights(self):
        data, labels = self._toy()
        p = partition(data, labels, num_workers=10, iid=1)
        b = p.beta(range(5))
        assert b.shape == (5,)
        np.testing.assert_allclose(b.sum(), 1.0, rtol=1e-6)

    def test_determinism(self):
        data, labels = self._toy()
        p1 = partition(data, labels, 10, 1)
        p2 = partition(data, labels, 10, 1)
        np.testing.assert_array_equal(p1.data, p2.data)


class TestSyntheticMNIST:
    def test_shapes(self):
        imgs, labels = synthetic_mnist(n=2000)
        assert imgs.shape == (2000, 28, 28)
        assert imgs.dtype == np.uint8
        assert set(np.unique(labels)) <= set(range(10))

    def test_classes_distinct(self):
        imgs, labels = synthetic_mnist(n=5000)
        means = np.stack([imgs[labels == c].mean(0) for c in range(10)])
        # pairwise distinct class templates
        for a in range(10):
            for b in range(a + 1, 10):
                assert np.abs(means[a] - means[b]).mean() > 5.0


class TestFashionGlyphs:
    def test_fashion_bank_distinct_from_mnist(self):
        """fashion-mnist's synthetic stand-in is a DIFFERENT workload from
        mnist's (the reference sweeps them as two datasets,
        capgan.py:465-478)."""
        from cglgan_tpu.data.mnist import (_fashion_glyph_bank, _glyph_bank,
                                           load_image_dataset)
        fb, mb = _fashion_glyph_bank(), _glyph_bank()
        diff = np.abs(fb - mb).mean(axis=(1, 2))
        assert (diff > 0.05).all()
        m, _ = load_image_dataset("mnist", None)
        f, fl = load_image_dataset("fashion-mnist", None)
        assert m.shape == f.shape == (60000, 28, 28)
        assert not np.array_equal(m, f)
        # deterministic and label-conditioned
        f2, fl2 = load_image_dataset("fashion-mnist", None)
        np.testing.assert_array_equal(f, f2)
        np.testing.assert_array_equal(fl, fl2)
