"""Federation collectives — including under a real sharded 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cglgan_tpu.core import meshes
from cglgan_tpu.fed import collectives as C
from cglgan_tpu.fed.sampling import fegan_scores, init_groups
from cglgan_tpu.fed.topology import block_assignment, server_beta

pytestmark = pytest.mark.smoke


def _tree(n=8, d=4, seed=0):
    rng = np.random.default_rng(seed)
    return {"w": jnp.asarray(rng.normal(size=(n, d, d)).astype(np.float32)),
            "b": jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))}


class TestCollectives:
    def test_fedavg(self):
        t = _tree()
        avg = C.fedavg_tree(t)
        np.testing.assert_allclose(avg["w"], np.asarray(t["w"]).mean(0),
                                   rtol=1e-6)

    def test_weighted_avg(self):
        t = _tree()
        w = np.asarray([0.5, 0.5, 0, 0, 0, 0, 0, 0], np.float32)
        avg = C.weighted_avg_tree(t, w)
        np.testing.assert_allclose(
            avg["b"], np.asarray(t["b"])[:2].mean(0), rtol=1e-6)

    def test_sigma_mix(self):
        a, b = _tree(seed=1), _tree(seed=2)
        m = C.sigma_mix(a, b, 1.0)
        np.testing.assert_allclose(m["w"], a["w"])
        m = C.sigma_mix(a, b, 0.0)
        np.testing.assert_allclose(m["w"], b["w"])

    def test_ring_shift(self):
        t = _tree()
        r = C.ring_shift_tree(t, 1)
        np.testing.assert_allclose(np.asarray(r["w"])[1],
                                   np.asarray(t["w"])[0])
        np.testing.assert_allclose(np.asarray(r["w"])[0],
                                   np.asarray(t["w"])[7])

    def test_neighbor_share(self):
        t = _tree()
        s = C.neighbor_share_tree(t, 4)
        w = np.asarray(t["w"])
        np.testing.assert_allclose(np.asarray(s["w"])[0], w[:4].mean(0),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s["w"])[5], w[4:].mean(0),
                                   rtol=1e-5)

    def test_delta_share_first_exchange_is_block_mean(self):
        """From the zero anchor (ACGAN/MNIST/acgan.py:235-237) the first
        delta exchange coincides with the plain block parameter mean."""
        t = _tree()
        anchor = jax.tree.map(jnp.zeros_like, t)
        new_p, new_anchor = C.delta_share_tree(t, anchor, 4)
        mean = C.neighbor_share_tree(t, 4)
        np.testing.assert_allclose(np.asarray(new_p["w"]),
                                   np.asarray(mean["w"]), rtol=1e-5)
        # the new anchor is the pre-exchange params (the sketch's `w += g`)
        np.testing.assert_allclose(np.asarray(new_anchor["b"]),
                                   np.asarray(t["b"]))

    def test_delta_share_accumulation_hand_math(self):
        """Second exchange: p_i <- w_i + mean_k(p_j - w_j) with per-member
        anchors — hand-computed on scalars."""
        p1 = {"x": jnp.asarray([1.0, 3.0])}           # group of 2
        w0 = jax.tree.map(jnp.zeros_like, p1)
        p1_new, w1 = C.delta_share_tree(p1, w0, 2)
        np.testing.assert_allclose(np.asarray(p1_new["x"]), [2.0, 2.0])
        np.testing.assert_allclose(np.asarray(w1["x"]), [1.0, 3.0])
        # local training moves both members by +2 / +6 from p1_new
        p2 = {"x": jnp.asarray([4.0, 8.0])}
        p2_new, w2 = C.delta_share_tree(p2, w1, 2)
        # deltas vs anchors: 4-1=3, 8-3=5; mean 4; p_i <- w_i + 4
        np.testing.assert_allclose(np.asarray(p2_new["x"]), [5.0, 7.0])
        np.testing.assert_allclose(np.asarray(w2["x"]), [4.0, 8.0])

    def test_select_update(self):
        old, new = _tree(seed=1), _tree(seed=2)
        mask = np.asarray([1, 0, 1, 0, 1, 0, 1, 0], np.float32)
        out = C.select_update_tree(old, new, mask)
        np.testing.assert_allclose(np.asarray(out["w"])[0],
                                   np.asarray(new["w"])[0])
        np.testing.assert_allclose(np.asarray(out["w"])[1],
                                   np.asarray(old["w"])[1])


class TestShardedCollectives:
    """Same ops with the clients axis sharded across 8 CPU devices — the
    multi-chip code path (FedAvg lowers to all-reduce over the mesh)."""

    def test_fedavg_sharded(self):
        mesh = meshes.client_mesh()
        assert mesh.devices.size == 8
        t = _tree()
        ts = meshes.shard_client_tree(t, mesh)
        avg = jax.jit(C.fedavg_tree)(ts)
        np.testing.assert_allclose(np.asarray(avg["w"]),
                                   np.asarray(t["w"]).mean(0), rtol=1e-6)

    def test_ring_shift_sharded(self):
        mesh = meshes.client_mesh()
        t = _tree()
        ts = meshes.shard_client_tree(t, mesh)
        out = jax.jit(lambda x: C.ring_shift_tree(x, 1))(ts)
        np.testing.assert_allclose(np.asarray(out["w"]),
                                   np.roll(np.asarray(t["w"]), 1, axis=0),
                                   rtol=1e-6)


class TestTopology:
    def test_block_assignment(self):
        assert block_assignment(6, 2) == [[0, 1, 2], [3, 4, 5]]

    def test_server_beta(self):
        b = server_beta(np.array([1, 3, 2, 2]), 2)
        np.testing.assert_allclose(b, [[0.25, 0.75], [0.5, 0.5]])


class TestFeGANSampling:
    def test_scores_iid_zero(self):
        """Workers whose class mix equals the global mix have sk ~ 0."""
        freq = np.full((4, 10), 100)
        sk = fegan_scores(freq, freq.sum(0))
        np.testing.assert_allclose(sk, 0.0, atol=1e-6)

    def test_scores_skewed_positive(self):
        freq = np.zeros((2, 10), np.int64)
        freq[0, 0] = 1000          # single-class worker: high KL
        freq[1] = 100              # uniform worker
        sk = fegan_scores(freq, freq.sum(0))
        assert sk[0] > sk[1] >= 0

    def test_groups_shape_and_validity(self):
        rng = np.random.default_rng(0)
        freq = rng.integers(0, 50, (8, 10))
        g = init_groups(8, freq, frac_workers=0.5, num_rounds=100)
        assert g.shape == (100, 4)
        assert g.min() >= 0 and g.max() < 8
        # no duplicates inside a group (visited-guard)
        for row in g[:20]:
            assert len(set(row.tolist())) == len(row)

    def test_groups_balanced(self):
        """Rare-class holders appear despite being few."""
        freq = np.zeros((8, 10), np.int64)
        freq[:7, :5] = 100            # 7 workers hold classes 0-4
        freq[7, 5:] = 100             # 1 worker holds classes 5-9
        g = init_groups(8, freq, frac_workers=0.25, num_rounds=50)
        # worker 7 is the only source of half the classes: sampled often
        assert (g == 7).any(axis=1).mean() > 0.5
