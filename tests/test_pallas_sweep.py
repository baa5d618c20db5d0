"""Fused VMEM-resident local D/G-sweep kernel vs the jitted scan path.

The kernel must reproduce ``algos.fedavg_family._local_sweep`` (the
interleaved D step / G step local loop + optax.adam on both nets, with
identical PRNG draws) to float tolerance, through full flgan and fegan
rounds including aggregation.

The kernel is a documented NEGATIVE perf result (0.78-0.95x the XLA path
on v5e — see ops/pallas/fused_sweep.py); it never engages automatically
and is forced on here purely to certify its numerics."""
import jax
import numpy as np
import pytest

from cglgan_tpu.algos.registry import build_runner, load_partition
from cglgan_tpu.core.config import FedGANConfig


def _compare(algo, epoch=2, rounds=3, **kw):
    base = dict(algo=algo, dataset="2dmg", num_workers=4, num_class=4,
                num_sample=64, batch_size=16, iid=1, epoch=epoch,
                num_communication=8, **kw)
    cfg_k = FedGANConfig(pallas_sweep=True, **base)
    cfg_b = FedGANConfig(**base)             # default: XLA path
    part = load_partition(cfg_k)
    rk, rb = build_runner(cfg_k, part), build_runner(cfg_b, part)
    sk, sb = rk.init_state(), rb.init_state()
    fk, fb = jax.jit(rk.round_fn), jax.jit(rb.round_fn)
    for _ in range(rounds):
        sk, mk = fk(sk)
        sb, mb = fb(sb)
    for name, a, b in (("g", sk.g, sb.g), ("d", sk.d, sb.d)):
        for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-4, atol=1e-5, err_msg=name)
        # Adam moments advance identically too (persistent per worker)
        for x, y in zip(jax.tree.leaves(a.opt), jax.tree.leaves(b.opt)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-3, atol=1e-5, err_msg=name)
    for key in mk:
        assert abs(float(mk[key]) - float(mb[key])) < 1e-4, key


class TestFusedSweep:
    def test_flgan_rounds_match_baseline(self):
        """FL-GAN 2DMG: 100-256-128-2 G (3 linears), uniform FedAvg."""
        _compare("flgan", epoch=2)

    def test_flgan_epoch3(self):
        _compare("flgan", epoch=3, rounds=2)

    def test_fegan_rounds_match_baseline(self):
        """FeGAN 2DMG: 100-32-2 G (2 linears), group schedule + exp(sk)
        weighting + per-member select of opt state."""
        _compare("fegan", epoch=2, frac_workers=0.5)

    def test_force_flag_rejects_ineligible(self):
        cfg = FedGANConfig(algo="flgan", dataset="synthetic-mnist",
                           num_workers=4, batch_size=16, pallas_sweep=True)
        with pytest.raises(ValueError, match="pallas_sweep"):
            build_runner(cfg)

    def test_auto_never_engages(self):
        """Negative perf result: auto (None) always resolves to the XLA
        path, at every epoch count."""
        from cglgan_tpu.ops.pallas import fused_sweep
        for epoch in (1, 2, 10):
            cfg = FedGANConfig(algo="flgan", dataset="2dmg", num_workers=4,
                               batch_size=16, epoch=epoch)
            assert not fused_sweep.eligible(cfg, None)

    def test_cgl_family_rejected(self):
        from cglgan_tpu.ops.pallas import fused_sweep
        cfg = FedGANConfig(algo="cglgan", dataset="2dmg", num_workers=4,
                           batch_size=16, epoch=4, pallas_sweep=True)
        with pytest.raises(ValueError, match="pallas_sweep"):
            fused_sweep.eligible(cfg, None)
