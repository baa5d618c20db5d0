import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cglgan_tpu.models import nn
from cglgan_tpu.models.zoo import build_discriminator, build_generator


KEY = jax.random.key(0)


class TestLayers:
    def test_linear_init_bounds(self):
        p = nn.linear_init(KEY, 100, 50)
        bound = 1 / np.sqrt(100)
        assert np.abs(p["w"]).max() <= bound
        assert np.abs(p["b"]).max() <= bound
        assert p["w"].shape == (100, 50)

    def test_batchnorm_train_normalises(self):
        p, s = nn.bn_init(8)
        x = jax.random.normal(KEY, (64, 8)) * 3 + 5
        y, s2 = nn.batchnorm(p, s, x, train=True, eps=1e-5)
        np.testing.assert_allclose(np.asarray(y.mean(0)), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(y.std(0)), 1.0, atol=1e-2)
        # running stats moved toward batch stats with momentum 0.1
        np.testing.assert_allclose(np.asarray(s2["mean"]),
                                   0.1 * np.asarray(x.mean(0)), rtol=1e-4)

    def test_batchnorm_eval_uses_running(self):
        p, s = nn.bn_init(4)
        x = jnp.ones((16, 4)) * 2.0
        y, s2 = nn.batchnorm(p, s, x, train=False, eps=0.0)
        np.testing.assert_allclose(np.asarray(y), 2.0, atol=1e-5)
        assert s2 is s

    def test_dcgan_reinit(self):
        p = {"lin": nn.linear_init(KEY, 64, 64),
             "bn": nn.bn_init(64)[0]}
        q = nn.dcgan_reinit(KEY, p)
        assert abs(float(q["lin"]["w"].std()) - 0.02) < 0.005
        assert float(jnp.abs(q["lin"]["b"]).max()) == 0.0
        assert abs(float(q["bn"]["scale"].mean()) - 1.0) < 0.01

    def test_upsample2x(self):
        x = jnp.arange(4.0).reshape(1, 1, 2, 2)
        y = nn.upsample2x(x)
        assert y.shape == (1, 1, 4, 4)
        np.testing.assert_array_equal(np.asarray(y[0, 0, :2, :2]), 0.0)


GEN_CASES = [
    ("2dmg-small", 1, (7, 2)),
    ("2dmg-mlp", 1, (7, 2)),
    ("mnist-mlp", 1, (7, 1, 28, 28)),
    ("conv", 1, (7, 1, 32, 32)),
]
MULTI_CASES = [
    ("2dmg-multipath", 4, (4, 7, 2)),
    ("mnist-multipath", 4, (4, 7, 1, 28, 28)),
    ("conv-multipath", 4, (4, 7, 1, 32, 32)),
]


class TestGenerators:
    @pytest.mark.parametrize("family,heads,want", GEN_CASES + MULTI_CASES)
    def test_shapes_and_range(self, family, heads, want):
        g = build_generator(family, num_heads=heads)
        params, state = g.init(KEY)
        z = jax.random.normal(KEY, (7, 100))
        y, new_state = g.apply(params, state, z, train=True)
        assert y.shape == want
        assert float(jnp.abs(y).max()) <= 1.0 + 1e-6  # tanh output

    def test_multipath_heads_differ(self):
        g = build_generator("2dmg-multipath", num_heads=3)
        params, state = g.init(KEY)
        z = jax.random.normal(KEY, (5, 100))
        y, _ = g.apply(params, state, z)
        assert not np.allclose(np.asarray(y[0]), np.asarray(y[1]))

    def test_bn_state_updates_in_train(self):
        g = build_generator("mnist-mlp")
        params, state = g.init(KEY)
        z = jax.random.normal(KEY, (32, 100))
        _, s2 = g.apply(params, state, z, train=True)
        changed = jax.tree.map(lambda a, b: not np.allclose(a, b), state, s2)
        assert any(jax.tree.leaves(changed))


class TestDiscriminators:
    @pytest.mark.parametrize("family,out_dim,xshape", [
        ("2dmg", 1, (9, 2)),
        ("mnist", 1, (9, 1, 28, 28)),
        ("mnist", 2, (9, 1, 28, 28)),
        ("conv", 1, (9, 1, 32, 32)),
    ])
    def test_shapes(self, family, out_dim, xshape):
        d = build_discriminator(family, out_dim)
        params, state = d.init(KEY)
        x = jax.random.normal(KEY, xshape)
        y, _ = d.apply(params, state, x, train=True, rng=KEY)
        assert y.shape == (9, out_dim)
        if family == "2dmg" or (family == "mnist" and out_dim == 1):
            assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0

    def test_vmap_over_stacked_clients(self):
        """The core federated trick: one batched matmul for W client Ds."""
        d = build_discriminator("mnist", 1)
        keys = jax.random.split(KEY, 8)
        params, states = jax.vmap(lambda k: d.init(k))(keys)
        x = jax.random.normal(KEY, (8, 16, 784))
        y, _ = jax.vmap(lambda p, s, xx: d.apply(p, s, xx, train=True))(
            params, states, x)
        assert y.shape == (8, 16, 1)
        # distinct per-client params give distinct outputs
        assert not np.allclose(np.asarray(y[0]), np.asarray(y[1]))
