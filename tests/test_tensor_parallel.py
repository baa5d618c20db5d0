"""Tensor parallelism as a framework feature (cfg.model_shards).

SURVEY.md §2.2: TP is absent in the reference (models are <=1.5M params) and
not needed for fidelity, but the build exposes optional Megatron-style
column sharding of generator weights over a ``model`` mesh axis
(core.meshes.fed_mesh / place_model_tp, FedGANConfig.model_shards,
``tpufed run --model-shards N``).  Certified here at two levels: forward and
gradient equality on a sharded generator, and a FULL jitted CGL-GAN round on
a (clients=4, model=2) mesh matching the unsharded round numerically.
"""
import jax
import jax.numpy as jnp
import numpy as np

from cglgan_tpu.core import meshes
from cglgan_tpu.models.zoo import build_generator


class TestTensorParallelOption:
    def test_sharded_forward_and_grad_match_replicated(self):
        mesh = meshes.fed_mesh(8, model_shards=8)
        # (clients=1, model=8): pure TP mesh
        g = build_generator("mnist-mlp")
        params, bn = g.init(jax.random.key(0))
        z = jax.random.normal(jax.random.key(1), (32, 100))

        ref, _ = g.apply(params, bn, z, train=True)

        tp_params = meshes.place_model_tp(params, mesh)
        out, _ = jax.jit(lambda p: g.apply(p, bn, z, train=True))(tp_params)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        def loss(p):
            y, _ = g.apply(p, bn, z, train=True)
            return jnp.mean(y ** 2)

        g_ref = jax.grad(loss)(params)
        g_tp = jax.jit(jax.grad(loss))(tp_params)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_tp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_full_cgl_round_under_tp_matches_unsharded(self):
        """A complete jitted CGL-GAN round with the generator column-sharded
        over `model` (and D state over `clients`) must match the single-
        device round numerically — TP is a layout choice, not a semantic
        one."""
        from cglgan_tpu.algos.registry import build_runner, load_partition
        from cglgan_tpu.core.config import FedGANConfig

        base = dict(algo="cglgan", dataset="2dmg", num_workers=8,
                    num_servers=2, num_class=4, num_sample=64,
                    batch_size=16, iid=1, num_communication=2)
        cfg_ref = FedGANConfig(**base)
        cfg_tp = FedGANConfig(model_shards=2, **base)
        part = load_partition(cfg_ref)

        r_ref = build_runner(cfg_ref, part)
        s_ref, m_ref = jax.jit(r_ref.round_fn)(r_ref.init_state())

        mesh = meshes.fed_mesh(8, model_shards=2)
        assert dict(mesh.shape) == {"clients": 4, "model": 2}
        r_tp = build_runner(cfg_tp, part, mesh=mesh)
        s_tp, m_tp = jax.jit(r_tp.round_fn)(r_tp.init_state())

        for k in m_ref:
            np.testing.assert_allclose(float(m_ref[k]), float(m_tp[k]),
                                       rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree.leaves(s_ref.g.params),
                        jax.tree.leaves(s_tp.g.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_fed_mesh_validation(self):
        import pytest
        with pytest.raises(ValueError, match="divisible"):
            meshes.fed_mesh(8, model_shards=3)
        from cglgan_tpu.core.config import FedGANConfig
        with pytest.raises(ValueError, match="model_shards"):
            FedGANConfig(model_shards=0)
