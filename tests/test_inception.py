"""Inception-pool3 FID path: shapes, weight loading, stats, evaluator wiring.

No pretrained weights exist on this zero-egress image; these tests certify
the full plumbing with random weights of the exact pretrained shapes, so real
torchvision ``inception_v3`` weights drop in unchanged
(reference: FLGAN/MNIST/flgan.py:62-104 scores with ignite's InceptionV3)."""
import numpy as np
import pytest

from cglgan_tpu.evalx.inception import (CONV_SHAPES, inception_extractor,
                                        inception_init, load_fid_stats,
                                        load_inception_weights, preprocess,
                                        save_fid_stats)


class TestInception:
    def test_conv_inventory(self):
        # 94 BasicConv2d blocks on the pool3 path of torchvision inception_v3
        assert len(CONV_SHAPES) == 94
        assert CONV_SHAPES["Conv2d_1a_3x3"] == (32, 3, 3, 3)
        assert CONV_SHAPES["Mixed_7c.branch_pool"][1] == 2048

    def test_pool3_features_shape(self):
        ex = inception_extractor()
        x = np.random.default_rng(0).normal(size=(2, 1, 28, 28)).astype(
            np.float32)
        f = np.asarray(ex.apply(ex.params, x))
        assert f.shape == (2, 2048)
        assert np.isfinite(f).all()

    def test_preprocess(self):
        x = np.zeros((3, 28, 28), np.float32)    # channelless batch
        y = preprocess(x)
        assert y.shape == (3, 3, 299, 299)

    def test_npz_weight_roundtrip(self, tmp_path):
        import jax
        params = inception_init(jax.random.key(7))
        path = str(tmp_path / "iv3.npz")
        np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
        p2 = load_inception_weights(path)
        assert set(p2) == set(params)
        np.testing.assert_array_equal(
            np.asarray(params["Mixed_7c.branch_pool.conv.weight"]),
            np.asarray(p2["Mixed_7c.branch_pool.conv.weight"]))

    def test_weight_shape_validation(self, tmp_path):
        import jax
        params = {k: np.asarray(v)
                  for k, v in inception_init(jax.random.key(0)).items()}
        params["Conv2d_1a_3x3.conv.weight"] = np.zeros((1, 1, 1, 1),
                                                       np.float32)
        path = str(tmp_path / "bad.npz")
        np.savez(path, **params)
        with pytest.raises(ValueError, match="expected"):
            load_inception_weights(path)

    def test_fid_stats_roundtrip(self, tmp_path):
        path = str(tmp_path / "stats.npz")
        mu = np.arange(8.0)
        sigma = np.eye(8)
        save_fid_stats(path, mu, sigma)
        mu2, sigma2 = load_fid_stats(path)
        np.testing.assert_array_equal(mu, mu2)
        np.testing.assert_array_equal(sigma, sigma2)

    def test_fid_stats_side_guard(self, tmp_path):
        """Stats recorded at 28px must be rejected by a 32px (--conv) run;
        legacy npz without a side field stays loadable."""
        path = str(tmp_path / "stats.npz")
        save_fid_stats(path, np.zeros(4), np.eye(4), side=28)
        load_fid_stats(path, expect_side=28)          # matching: fine
        with pytest.raises(ValueError, match="28px.*32px"):
            load_fid_stats(path, expect_side=32)
        legacy = str(tmp_path / "legacy.npz")
        save_fid_stats(legacy, np.zeros(4), np.eye(4))
        load_fid_stats(legacy, expect_side=32)        # no side: accepted


class TestEvaluatorUnification:
    def test_train_returns_fid_on_image_config(self):
        """Library callers of train() get FID/IS ticks on image configs —
        the eval logic lives in evalx.evaluator, not the CLI."""
        from cglgan_tpu.algos.registry import build_runner
        from cglgan_tpu.algos.runner import train
        from cglgan_tpu.core.config import FedGANConfig
        from cglgan_tpu.evalx.evaluator import make_evaluator

        cfg = FedGANConfig(algo="capgan", dataset="synthetic-mnist",
                           num_workers=2, num_servers=1, num_class=4,
                           num_sample=64, batch_size=16,
                           num_communication=2, num_plt=2)
        runner = build_runner(cfg)
        ev = make_evaluator(cfg, runner.part, probe_steps=10)
        out = train(runner, rounds=2, eval_every=2, evaluator=ev)
        tick = out["history"][0]
        assert "fid" in tick and np.isfinite(tick["fid"])
        assert "inception_score" in tick and tick["inception_score"] >= 1.0

    def test_conv_config_evaluator(self):
        """Regression: the probe classifier must size its flatten layer from
        the data side (conv configs run at 32x32, not 28x28)."""
        from cglgan_tpu.algos.registry import build_runner
        from cglgan_tpu.core.config import FedGANConfig
        from cglgan_tpu.evalx.evaluator import make_evaluator

        cfg = FedGANConfig(algo="mdgan", dataset="synthetic-mnist",
                           conv=True, num_workers=2, num_servers=1,
                           num_class=4, num_sample=64, batch_size=8)
        r = build_runner(cfg)
        ev = make_evaluator(cfg, r.part, eval_n=8, probe_steps=2)
        m = ev(r, r.init_state())
        assert np.isfinite(m["fid"]) and m["inception_score"] >= 1.0

    def test_fid_stats_dim_mismatch_fails_fast(self, tmp_path):
        from cglgan_tpu.algos.registry import build_runner
        from cglgan_tpu.core.config import FedGANConfig
        from cglgan_tpu.evalx.evaluator import make_evaluator

        path = str(tmp_path / "pool3.npz")
        save_fid_stats(path, np.zeros(2048), np.eye(2048))
        cfg = FedGANConfig(algo="capgan", dataset="synthetic-mnist",
                           num_workers=2, num_servers=1, num_class=4,
                           num_sample=64, batch_size=8)
        r = build_runner(cfg)
        with pytest.raises(ValueError, match="2048-d"):
            make_evaluator(cfg, r.part, eval_n=8, probe_steps=1,
                           fid_stats=path)

    def test_train_2dmg_metrics_and_absolute_round(self):
        from cglgan_tpu.algos.registry import build_runner
        from cglgan_tpu.algos.runner import train
        from cglgan_tpu.core.config import FedGANConfig

        cfg = FedGANConfig(algo="flgan", dataset="2dmg", num_workers=2,
                           num_class=4, num_sample=64, batch_size=16,
                           num_communication=4, num_plt=2)
        runner = build_runner(cfg)
        out = train(runner, rounds=2, eval_every=2)
        # resumed continuation reports ABSOLUTE rounds
        out2 = train(runner, rounds=2, eval_every=2, state=out["state"])
        assert out["history"][0]["round"] == 2
        assert out2["history"][0]["round"] == 4
        assert "kl_score" in out2["history"][0]
        assert "mode_coverage" in out2["history"][0]
