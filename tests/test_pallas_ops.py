"""Pallas ops (run in interpreter mode on the CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cglgan_tpu.ops.pallas.fused_adam import fused_adam


class TestFusedAdam:
    def _setup(self):
        params = {"w": jax.random.normal(jax.random.key(0), (130, 170)),
                  "b": jax.random.normal(jax.random.key(1), (170,))}
        grads = jax.tree.map(lambda x: 0.1 * jnp.ones_like(x), params)
        return params, grads

    def test_matches_optax_f32(self):
        params, grads = self._setup()
        fa = fused_adam(2e-4, 0.5, 0.999, moment_dtype=jnp.float32,
                        stochastic=False)
        st = fa.init(params)
        p, st = fa.step(grads, st, params)
        p, st = fa.step(grads, st, p)

        tx = optax.adam(2e-4, b1=0.5, b2=0.999)
        ts = tx.init(params)
        q = params
        for _ in range(2):
            u, ts = tx.update(grads, ts, q)
            q = optax.apply_updates(q, u)
        for k in params:
            np.testing.assert_allclose(np.asarray(p[k]), np.asarray(q[k]),
                                       rtol=2e-5, atol=1e-7)

    def test_bf16_moments_track(self):
        params, grads = self._setup()
        fa = fused_adam(2e-4, 0.5, 0.999, moment_dtype=jnp.bfloat16)
        st = fa.init(params)
        assert jax.tree.leaves(st.m)[0].dtype == jnp.bfloat16
        p = params
        for _ in range(10):
            p, st = fa.step(grads, st, p)
        tx = optax.adam(2e-4, b1=0.5, b2=0.999)
        ts = tx.init(params)
        q = params
        for _ in range(10):
            u, ts = tx.update(grads, ts, q)
            q = optax.apply_updates(q, u)
        drift = max(float(jnp.abs(p[k] - q[k]).max()) for k in p)
        assert drift < 0.2 * (2e-4 * 10)   # within 20% of total travel

    def test_jittable(self):
        params, grads = self._setup()
        fa = fused_adam(1e-3)
        st = fa.init(params)
        p, st2 = jax.jit(fa.step)(grads, st, params)
        assert int(st2.count) == 1
        assert not np.allclose(np.asarray(p["w"]), np.asarray(params["w"]))
