"""Straggler/dropout simulation (TPU-build extension; SURVEY.md §5)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cglgan_tpu.algos.common import participation_mask
from cglgan_tpu.algos.registry import build_runner
from cglgan_tpu.core.config import FedGANConfig


def cfg_for(algo, rate, **kw):
    base = dict(algo=algo, dataset="2dmg", num_workers=4, num_class=5,
                num_sample=200, iid=1, batch_size=32, num_communication=4,
                num_plt=2, dropout_rate=rate)
    base.update(kw)
    return FedGANConfig(**base)


class TestParticipationMask:
    def test_rate_zero_all_alive(self):
        m = participation_mask(jax.random.key(0), 8, 0.0)
        np.testing.assert_array_equal(np.asarray(m), 1.0)

    def test_always_one_survivor(self):
        for s in range(20):
            m = participation_mask(jax.random.key(s), 6, 0.99)
            assert float(m.sum()) >= 1.0

    def test_rate_statistics(self):
        ms = jnp.stack([participation_mask(jax.random.key(s), 50, 0.3)
                        for s in range(40)])
        assert abs(float(ms.mean()) - 0.7) < 0.05


class TestDropoutRounds:
    @pytest.mark.parametrize("algo", ["flgan", "mdgan", "acgan", "fegan"])
    def test_runs_and_differs_from_full_participation(self, algo):
        kw = dict(num_servers=2) if algo == "acgan" else {}
        r_full = build_runner(cfg_for(algo, 0.0, **kw))
        r_drop = build_runner(cfg_for(algo, 0.5, **kw))
        s_full, m_full = jax.jit(r_full.round_fn)(r_full.init_state())
        s_drop, m_drop = jax.jit(r_drop.round_fn)(r_drop.init_state())
        for v in m_drop.values():
            assert np.isfinite(float(v))
        a = jax.tree.leaves(s_full.g.params)[0]
        b = jax.tree.leaves(s_drop.g.params)[0]
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_cgl_family_rejects_dropout(self):
        with pytest.raises(ValueError, match="CGL family"):
            cfg_for("capgan", 0.3)

    def test_dropped_mdgan_clients_keep_their_d(self):
        """With near-total dropout most Ds must stay at init."""
        cfg = cfg_for("mdgan", 0.9, num_workers=8)
        r = build_runner(cfg)
        s0 = r.init_state()
        s1, _ = jax.jit(r.round_fn)(s0)
        d0 = np.asarray(jax.tree.leaves(s0.d.params)[0][0])  # (k, ...)
        d1 = np.asarray(jax.tree.leaves(s1.d.params)[0][0])
        unchanged = sum(np.allclose(d0[i], d1[i]) for i in range(8))
        assert unchanged >= 5
