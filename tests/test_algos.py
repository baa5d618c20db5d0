"""Integration tests: every algorithm's jitted round on tiny 2DMG configs,
plus a golden convergence check (SURVEY.md §4: synthetic fast workload as
fixture, in-loop metrics as acceptance criteria).

One compile per algorithm: each parametrized case runs init -> single jitted
round (state-change assertions) -> short scan (metric assertions) in one test.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cglgan_tpu.algos.registry import build_runner
from cglgan_tpu.algos.runner import train
from cglgan_tpu.core.config import FedGANConfig


def tiny_cfg(algo, **kw):
    base = dict(algo=algo, dataset="2dmg", num_workers=4, num_class=5,
                num_sample=200, iid=1, batch_size=32, num_communication=4,
                num_plt=2, epoch=1)
    base.update(kw)
    return FedGANConfig(**base)


ALL = [("flgan", {}), ("fegan", dict(frac_workers=0.5)),
       ("mdgan", {}), ("acgan", dict(num_servers=2, E=2)),
       ("cglgan", dict(num_servers=2)), ("capgan", {}),
       ("mixgan", dict(num_servers=2))]


@pytest.mark.smoke
class TestRounds:
    @pytest.mark.parametrize("algo,kw", ALL)
    def test_round_and_training(self, algo, kw):
        r = build_runner(tiny_cfg(algo, **kw))
        s0 = r.init_state()

        # one jitted round: params move, counter advances
        s1, metrics = jax.jit(r.round_fn)(s0)
        g0 = jax.tree.leaves(s0.g.params)[0]
        g1 = jax.tree.leaves(s1.g.params)[0]
        assert not np.allclose(np.asarray(g0), np.asarray(g1))
        d0 = jax.tree.leaves(s0.d.params)[0]
        d1 = jax.tree.leaves(s1.d.params)[0]
        assert not np.allclose(np.asarray(d0), np.asarray(d1))
        assert int(s1.t) == 1
        for k, v in metrics.items():
            assert np.isfinite(float(v)), f"{algo}: {k} not finite"

        # scan-driven training with eval ticks
        out = train(r, rounds=4, eval_every=2, eval_n=100, state=s1)
        assert len(out["history"]) == 2
        for tick in out["history"]:
            for k, v in tick.items():
                assert np.isfinite(v), f"{algo}: {k} not finite"

        # eval sampling
        samples = r.sample(out["state"], 100)
        assert samples.shape == (100, 2)
        assert np.abs(np.asarray(samples)).max() <= 1.0 + 1e-6

    def test_determinism(self):
        r = build_runner(tiny_cfg("capgan"))
        f = jax.jit(r.round_fn)
        a, _ = f(r.init_state())
        b, _ = f(r.init_state())
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


class TestAcganGossip:
    """--gossip delta vs mean (ACGAN/MNIST/acgan.py:240-263 sketch)."""

    def _run(self, gossip, rounds, **kw):
        r = build_runner(tiny_cfg("acgan", num_servers=1, E=2,
                                  gossip=gossip, **kw))
        s = r.init_state()
        f = jax.jit(r.round_fn)
        for _ in range(rounds):
            s, _ = f(s)
        return s

    def test_modes_coincide_at_first_exchange(self):
        """Single server, E covering all clients: from the zero anchor the
        first delta exchange IS the block mean, so the two modes agree
        exactly through the first exchange event (round E)."""
        sm = self._run("mean", rounds=2)
        sd = self._run("delta", rounds=2)
        for a, b in zip(jax.tree.leaves(sm.d.params),
                        jax.tree.leaves(sd.d.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    def test_modes_diverge_after_second_exchange(self):
        """From the second exchange on, per-member anchors make the delta
        exchange differ from the plain block mean."""
        sm = self._run("mean", rounds=4)
        sd = self._run("delta", rounds=4)
        leaves_m = jax.tree.leaves(sm.d.params)
        leaves_d = jax.tree.leaves(sd.d.params)
        assert any(not np.allclose(np.asarray(a), np.asarray(b))
                   for a, b in zip(leaves_m, leaves_d))

    def test_anchor_checkpoints_through_aux_slot(self):
        """Anchors ride FedState.lam: present for delta, None for mean."""
        sd = self._run("delta", rounds=1)
        assert sd.lam is not None
        anchors = jax.tree.leaves(sd.lam)
        assert all(np.all(np.asarray(a) == 0) for a in anchors)  # pre-E
        sd = self._run("delta", rounds=2)   # exchange fired at round 2
        assert any(np.any(np.asarray(a) != 0)
                   for a in jax.tree.leaves(sd.lam))
        sm = self._run("mean", rounds=1)
        assert sm.lam is None


class TestMultipathRouting:
    def test_heads_route_to_clients(self):
        """Each client's D sees only its head's fakes: per-head updates differ."""
        r = build_runner(tiny_cfg("mixgan", num_servers=1, num_workers=2))
        s0 = r.init_state()
        s1, _ = jax.jit(r.round_fn)(s0)
        # heads weight leaf is stacked (num_servers=1, num_heads=2, 32, 2);
        # compare the weight (not the 2-elem bias: Adam's first step is
        # sign*lr, so tiny leaves can coincide across heads)
        heads0 = np.asarray(jax.tree.leaves(s0.g.params["heads"])[1])[0]
        heads1 = np.asarray(jax.tree.leaves(s1.g.params["heads"])[1])[0]
        delta = heads1 - heads0
        assert np.abs(delta[0]).max() > 0
        assert np.abs(delta[1]).max() > 0
        assert not np.allclose(delta[0], delta[1])


class TestScanPieces:
    def test_piecewise_scan_matches_single_chunk(self):
        """train() splits an eval interval into scan_rounds-bounded device
        programs (the ragged-epochs sweeps crashed the TPU worker when the
        whole interval compiled into one ~7-minute program); piecewise
        execution must be bit-identical to the fused scan, with the same
        per-tick averaged metrics."""
        import dataclasses
        cfg = tiny_cfg("flgan", num_communication=12, num_plt=6)
        o1 = train(build_runner(cfg), rounds=12, eval_every=6)
        cfg2 = dataclasses.replace(cfg, scan_rounds=4)   # 6 = 4 + 2 pieces
        o2 = train(build_runner(cfg2), rounds=12, eval_every=6)
        for a, b in zip(jax.tree.leaves(o1["state"]),
                        jax.tree.leaves(o2["state"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for t1, t2 in zip(o1["history"], o2["history"]):
            assert t1["round"] == t2["round"]
            assert abs(t1["d_loss"] - t2["d_loss"]) < 1e-6


@pytest.mark.slow
class TestConvergence:
    def test_flgan_2dmg_learns(self):
        """Golden check: 5000 rounds of FL-GAN on 5-mode 2DMG must put a
        nontrivial fraction of generated mass onto the real support."""
        cfg = FedGANConfig(algo="flgan", dataset="2dmg", num_workers=4,
                           num_class=5, num_sample=500, iid=0, batch_size=100,
                           num_communication=5000, num_plt=5000, epoch=1)
        r = build_runner(cfg)
        out = train(r, rounds=5000, eval_every=5000, eval_n=1000)
        tick = out["history"][-1]
        assert tick["distribution_score"] > 0.2, tick
