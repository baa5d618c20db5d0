"""Native C++ dataplane (skipped when no toolchain can build it)."""
import os
import struct
import tempfile

import numpy as np
import pytest

from cglgan_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native dataplane not built")


class TestSynthGlyphs:
    def test_shapes_sorted_deterministic(self):
        imgs, labels = native.synth_glyphs(2000, 28, 10, seed=7)
        assert imgs.shape == (2000, 28, 28) and imgs.dtype == np.uint8
        assert (np.diff(labels) >= 0).all()
        imgs2, labels2 = native.synth_glyphs(2000, 28, 10, seed=7)
        np.testing.assert_array_equal(imgs, imgs2)
        imgs3, _ = native.synth_glyphs(2000, 28, 10, seed=8)
        assert not np.array_equal(imgs, imgs3)

    def test_templates_match_numpy_backend(self):
        """Class-mean images agree across backends (same glyph formulas)."""
        from cglgan_tpu.data.mnist import synthetic_mnist
        a, la = native.synth_glyphs(20000, 28, 10, seed=1)
        b, lb = synthetic_mnist(20000, backend="numpy", seed=1)
        means_a = np.stack([a[la == c].mean(0) for c in range(10)])
        means_b = np.stack([b[lb == c].mean(0) for c in range(10)])
        for c in range(10):
            # same-class templates close (<2% of the 0-255 scale)...
            assert np.abs(means_a[c] - means_b[c]).mean() < 4.0
            # ...and closer than any cross-class pairing
            cross = [np.abs(means_a[c] - means_b[o]).mean()
                     for o in range(10) if o != c]
            assert np.abs(means_a[c] - means_b[c]).mean() < min(cross)


class TestBuildShards:
    def test_wrap_semantics(self):
        data = np.arange(50 * 4, dtype=np.uint8).reshape(50, 4)
        out = native.build_shards(data, [np.array([3, 1]), np.arange(10)], 6)
        assert out.shape == (2, 6, 4)
        np.testing.assert_array_equal(out[0, 0], data[3])
        np.testing.assert_array_equal(out[0, 1], data[1])
        np.testing.assert_array_equal(out[0, 2], data[3])   # wrapped
        np.testing.assert_array_equal(out[1, 5], data[5])


class TestReadIdx:
    def test_roundtrip(self):
        arr = np.random.default_rng(0).integers(
            0, 255, (10, 5, 5)).astype(np.uint8)
        with tempfile.NamedTemporaryFile(suffix="-idx3-ubyte",
                                         delete=False) as f:
            f.write(struct.pack(">HBB", 0, 8, 3))
            f.write(struct.pack(">III", 10, 5, 5))
            f.write(arr.tobytes())
            path = f.name
        try:
            out = native.read_idx(path)
            np.testing.assert_array_equal(out, arr)
        finally:
            os.unlink(path)
