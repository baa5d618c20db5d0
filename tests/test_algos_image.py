"""Image-workload algorithm paths, incl. FL-GAN's ragged full-epoch sweep."""
import jax
import numpy as np
import pytest

from cglgan_tpu.algos.registry import build_runner
from cglgan_tpu.core.config import FedGANConfig
from cglgan_tpu.data.mnist import synthetic_mnist
from cglgan_tpu.data.partition import partition


def small_image_part(cfg, n=800):
    imgs, labels = synthetic_mnist(n=n, seed=3)
    return partition(imgs.reshape(n, -1), labels, cfg.num_workers, cfg.iid,
                     num_class=cfg.num_class, num_sample=100, seed=cfg.seed)


def img_cfg(algo, **kw):
    base = dict(algo=algo, dataset="synthetic-mnist", num_workers=4,
                num_class=10, num_sample=100, iid=1, batch_size=32,
                num_communication=2, num_plt=1)
    base.update(kw)
    return FedGANConfig(**base)


class TestImagePaths:
    def test_flgan_full_epoch_sweep(self):
        """MNIST FL-GAN trains `epoch` full ragged local epochs per round
        (FLGAN/MNIST/flgan.py:249-269) — masked scan over max steps."""
        cfg = img_cfg("flgan")
        assert cfg.resolved_local_sweep == "epochs"
        part = small_image_part(cfg)
        r = build_runner(cfg, part)
        s0 = r.init_state()
        s1, m = jax.jit(r.round_fn)(s0)
        assert np.isfinite(float(m["d_loss"]))
        g0 = jax.tree.leaves(s0.g.params)[0]
        g1 = jax.tree.leaves(s1.g.params)[0]
        assert not np.allclose(np.asarray(g0), np.asarray(g1))

    def test_flgan_batches_override(self):
        cfg = img_cfg("flgan", local_sweep="batches")
        assert cfg.resolved_local_sweep == "batches"
        part = small_image_part(cfg)
        r = build_runner(cfg, part)
        s1, m = jax.jit(r.round_fn)(r.init_state())
        assert np.isfinite(float(m["g_loss"]))

    def test_fegan_image(self):
        cfg = img_cfg("fegan", frac_workers=0.5)
        part = small_image_part(cfg)
        r = build_runner(cfg, part)
        s1, m = jax.jit(r.round_fn)(r.init_state())
        assert np.isfinite(float(m["g_loss"]))

    @pytest.mark.parametrize("algo,kw", [
        ("acgan", dict(num_servers=2)), ("mdgan", {}), ("capgan", {}),
    ])
    def test_loss_feedback_image(self, algo, kw):
        cfg = img_cfg(algo, **kw)
        part = small_image_part(cfg)
        r = build_runner(cfg, part)
        s1, m = jax.jit(r.round_fn)(r.init_state())
        for k, v in m.items():
            assert np.isfinite(float(v)), (algo, k)
        samples = r.sample(s1, 32)
        assert samples.shape[-2:] == (28, 28)

    @pytest.mark.parametrize("algo,kw", [
        ("mdgan", {}),
        # num_workers=8 so clients_per_server=4 matches the 4-way mesh
        # (the CGL D stack is sharded on the per-server clients dim)
        ("cglgan", dict(num_servers=2, cloud_epoch=1, num_workers=8)),
    ])
    def test_conv_round_on_sharded_mesh(self, algo, kw):
        """The conv LSGAN family (model/lsgan.py:3-98) executes a GSPMD
        round on a sharded clients mesh — the MLP families are pinned by
        dryrun_multichip; this covers the one model path it omits (stacked
        per-client conv D state and 32x32 shards split over devices,
        multipath conv heads + trunk cloud sync for cglgan)."""
        from cglgan_tpu.core.meshes import fed_mesh
        cfg = img_cfg(algo, conv=True, batch_size=8, num_sample=64,
                      num_class=4, **kw)
        r = build_runner(cfg, mesh=fed_mesh(4))
        s0 = r.init_state()
        s1, m = jax.jit(r.round_fn)(s0)
        for k, v in m.items():
            assert np.isfinite(float(v)), (algo, k)
        g0 = jax.tree.leaves(s0.g.params)[0]
        g1 = jax.tree.leaves(s1.g.params)[0]
        assert not np.allclose(np.asarray(g0), np.asarray(g1))
        samples = r.sample(s1, 8)
        assert samples.shape[-2:] == (32, 32)

    def test_capgan_d_head_is_2logit_ce(self):
        """CAP/Mix MNIST workers use CrossEntropy on a 2-logit D
        (capgan.py:311); CGL MNIST keeps sigmoid BCE."""
        assert img_cfg("capgan").resolved_d_head == "logits2"
        assert img_cfg("mixgan").resolved_d_head == "logits2"
        assert img_cfg("cglgan").resolved_d_head == "sigmoid"
        assert FedGANConfig(algo="capgan", dataset="2dmg").resolved_d_head \
            == "sigmoid"
