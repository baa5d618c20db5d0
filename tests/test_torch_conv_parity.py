"""Torch numeric parity for the conv LSGAN family (model/lsgan.py:3-98).

The MLP families are certified by one-step and multi-round trajectory parity
(test_torch_round_parity.py, test_trajectory_parity.py); this module closes
the conv gap: transplanted-weight forward parity (train AND eval mode — 2-D
BatchNorm(eps 0.8) batch stats, running-stat updates, nearest 2x upsample,
Dropout2d via replicated channel masks) and one-step Adam update parity for
conv G, conv MixG and conv D against fresh eager-torch twins.

Reference models: Generator (lsgan.py:3-27), MixGenerator (lsgan.py:37-70,
with the missing ``self.img_shape`` bug fixed per SURVEY.md §7.3.6),
Discriminator (lsgan.py:73-98 — raw 1-logit head, no sigmoid).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402
import optax                                                 # noqa: E402

from cglgan_tpu.algos import common                          # noqa: E402
from cglgan_tpu.models import nn as fnn                      # noqa: E402
from cglgan_tpu.models.zoo import (build_discriminator,      # noqa: E402
                                   build_generator)

B = 8
TOL = dict(rtol=2e-4, atol=2e-5)


def _t():
    torch.set_num_threads(1)
    return torch


from benchmarks.torch_conv_twins import (TorchConvD,      # noqa: E402
                                          TorchConvG, _np, copy_bn,
                                          copy_conv, copy_linear,
                                          dropout_masks)

# local aliases: the module grew out of this test file; the twins now live
# in benchmarks/torch_conv_twins.py so the trajectory twin can share them
_copy_conv = copy_conv
_copy_linear = copy_linear
_copy_bn = copy_bn
_dropout_masks = dropout_masks


@pytest.fixture(scope="module")
def conv_g():
    g = build_generator("conv")
    p, s = g.init(jax.random.key(11))
    return g, p, s


@pytest.fixture(scope="module")
def conv_d():
    d = build_discriminator("conv")
    p, s = d.init(jax.random.key(12))
    return d, p, s


class TestConvGeneratorParity:
    def test_train_forward_and_running_stats(self, conv_g):
        g, p, s = conv_g
        tg = TorchConvG()
        tg.load_jax(p, s)
        tg.train()
        z = np.random.default_rng(0).standard_normal((B, 100)).astype(
            np.float32)
        yj, s_new = g.apply(p, s, jnp.asarray(z), train=True)
        yt = tg(torch.from_numpy(z))
        np.testing.assert_allclose(_np(yj), yt.detach().numpy(), **TOL)
        # BN running stats advanced identically (momentum 0.1, unbiased var)
        for bn, key in ((tg.bn1, "bn1"), (tg.bn2, "bn2")):
            np.testing.assert_allclose(_np(s_new[key]["mean"]),
                                       bn.running_mean.numpy(), **TOL)
            np.testing.assert_allclose(_np(s_new[key]["var"]),
                                       bn.running_var.numpy(), **TOL)

    def test_eval_forward(self, conv_g):
        g, p, s = conv_g
        # perturb running stats away from init so eval mode exercises them
        s = jax.tree.map(lambda x: x + 0.3, s)
        tg = TorchConvG()
        tg.load_jax(p, s)
        tg.eval()
        z = np.random.default_rng(1).standard_normal((B, 100)).astype(
            np.float32)
        yj, _ = g.apply(p, s, jnp.asarray(z), train=False)
        yt = tg(torch.from_numpy(z))
        np.testing.assert_allclose(_np(yj), yt.detach().numpy(), **TOL)


class TestConvMixGeneratorParity:
    def test_train_forward_routes_heads(self):
        N = 3
        g = build_generator("conv-multipath", N)
        p, s = g.init(jax.random.key(13))
        z = np.random.default_rng(2).standard_normal((B, 100)).astype(
            np.float32)
        yj, s_new = g.apply(p, s, jnp.asarray(z), train=True)
        assert yj.shape == (N, B, 1, 32, 32)

        # torch twin: shared trunk thru c2, then per-head BN+LReLU+Conv+Tanh
        # (lsgan.py:40-64)
        nn_ = torch.nn
        l1 = nn_.Linear(100, 128 * 8 * 8)
        c1 = nn_.Conv2d(128, 128, 3, 1, 1)
        bn1 = nn_.BatchNorm2d(128, 0.8)
        c2 = nn_.Conv2d(128, 64, 3, 1, 1)
        up, act = nn_.Upsample(scale_factor=2), nn_.LeakyReLU(0.2)
        tr = p["trunk"]
        _copy_linear(l1, tr["l1"])
        _copy_conv(c1, tr["c1"])
        _copy_conv(c2, tr["c2"])
        _copy_bn(bn1, tr["bn1"], s["trunk"]["bn1"])
        heads = []
        for i in range(N):
            hb = nn_.BatchNorm2d(64, 0.8)
            hc = nn_.Conv2d(64, 1, 3, 1, 1)
            _copy_bn(hb, jax.tree.map(lambda x: x[i], p["heads"]["bn"]),
                     jax.tree.map(lambda x: x[i], s["heads"]["bn"]))
            _copy_conv(hc, jax.tree.map(lambda x: x[i], p["heads"]["c"]))
            heads.append((hb, hc))
        for m in [bn1] + [h[0] for h in heads]:
            m.train()
        x = l1(torch.from_numpy(z)).view(B, 128, 8, 8)
        hidden = c2(up(act(bn1(c1(up(x))))))
        for i, (hb, hc) in enumerate(heads):
            out = torch.tanh(hc(act(hb(hidden))))
            np.testing.assert_allclose(_np(yj[i]), out.detach().numpy(),
                                       **TOL)
            np.testing.assert_allclose(
                _np(jax.tree.map(lambda x: x[i],
                                 s_new["heads"]["bn"])["mean"]),
                hb.running_mean.detach().numpy(), **TOL)


class TestConvDiscriminatorParity:
    def test_train_forward_with_replicated_dropout(self, conv_d):
        d, p, s = conv_d
        td = TorchConvD()
        td.load_jax(p, s)
        td.train()
        rng = jax.random.key(21)
        x = np.random.default_rng(3).standard_normal(
            (B, 1, 32, 32)).astype(np.float32)
        yj, s_new = d.apply(p, s, jnp.asarray(x), train=True, rng=rng)
        yt = td(torch.from_numpy(x), masks=_dropout_masks(rng, B))
        np.testing.assert_allclose(_np(yj), yt.detach().numpy(), **TOL)
        for i in (2, 3, 4):
            np.testing.assert_allclose(
                _np(s_new[f"bn{i}"]["mean"]),
                getattr(td, f"bn{i}").running_mean.detach().numpy(), **TOL)

    def test_eval_forward_no_dropout(self, conv_d):
        d, p, s = conv_d
        s = jax.tree.map(lambda x: x + 0.2, s)
        td = TorchConvD()
        td.load_jax(p, s)
        td.eval()
        x = np.random.default_rng(4).standard_normal(
            (B, 1, 32, 32)).astype(np.float32)
        yj, _ = d.apply(p, s, jnp.asarray(x), train=False)
        yt = td(torch.from_numpy(x))
        np.testing.assert_allclose(_np(yj), yt.detach().numpy(), **TOL)

    def test_flat_input_reshapes(self, conv_d):
        """The slice-layout data path feeds flat (B, 1024) u8-normalised
        rows; apply must reshape to NCHW identically."""
        d, p, s = conv_d
        x = np.random.default_rng(5).standard_normal(
            (B, 32 * 32)).astype(np.float32)
        y_flat, _ = d.apply(p, s, jnp.asarray(x), train=False)
        y_img, _ = d.apply(p, s, jnp.asarray(x.reshape(B, 1, 32, 32)),
                           train=False)
        np.testing.assert_allclose(_np(y_flat), _np(y_img), rtol=1e-6)


class TestConvOneStepUpdateParity:
    def test_d_adam_step(self, conv_g, conv_d):
        """One D update on (real, fake) with BCE-with-logits + Adam(2e-4,
        (0.5, 0.999)) matches torch parameter-for-parameter."""
        g, gp, gs = conv_g
        d, dp, ds = conv_d
        adv = common.make_adv_loss("raw")
        rng = jax.random.key(31)
        z = np.random.default_rng(6).standard_normal((B, 100)).astype(
            np.float32)
        real = np.random.default_rng(7).standard_normal(
            (B, 1, 32, 32)).astype(np.float32)
        fake_j, _ = g.apply(gp, gs, jnp.asarray(z), train=True)
        r1, r2 = jax.random.split(rng)

        def loss_fn(dparams):
            out_r, bn1 = d.apply(dparams, ds, jnp.asarray(real), train=True,
                                 rng=r1)
            out_f, _ = d.apply(dparams, bn1, jax.lax.stop_gradient(fake_j),
                               train=True, rng=r2)
            return adv(out_r, 1.0) + adv(out_f, 0.0)

        grads = jax.grad(loss_fn)(dp)
        opt = optax.adam(2e-4, b1=0.5, b2=0.999)
        upd, _ = opt.update(grads, opt.init(dp), dp)
        new_dp = optax.apply_updates(dp, upd)

        td = TorchConvD()
        td.load_jax(dp, ds)
        td.train()
        topt = torch.optim.Adam(td.parameters(), lr=2e-4, betas=(0.5, 0.999))
        bcel = torch.nn.BCEWithLogitsLoss()
        out_r = td(torch.from_numpy(real), masks=_dropout_masks(r1, B))
        out_f = td(torch.from_numpy(_np(fake_j)),
                   masks=_dropout_masks(r2, B))
        loss = bcel(out_r, torch.ones(B, 1)) + bcel(out_f, torch.zeros(B, 1))
        topt.zero_grad()
        loss.backward()
        topt.step()
        np.testing.assert_allclose(_np(new_dp["c1"]["w"]),
                                   td.c1.weight.detach().numpy(), **TOL)
        np.testing.assert_allclose(_np(new_dp["bn3"]["scale"]),
                                   td.bn3.weight.detach().numpy(), **TOL)
        np.testing.assert_allclose(_np(new_dp["adv"]["w"]).T,
                                   td.adv.weight.detach().numpy(), **TOL)

    def test_g_backward_through_d(self, conv_g, conv_d):
        """G gradients through the (frozen) train-mode D match torch.

        Gradients, not the Adam-updated params, are compared here: on
        near-zero gradient elements float noise between the XLA and torch
        conv backwards flips signs, and Adam's normalizer amplifies a
        ~1e-8 gradient delta into a full ±lr update step (measured: 0.04%
        of elements at |delta| up to 2*lr).  The D-step test above covers
        update parity where gradients are well-conditioned."""
        g, gp, gs = conv_g
        d, dp, ds = conv_d
        adv = common.make_adv_loss("raw")
        rng = jax.random.key(41)
        z = np.random.default_rng(8).standard_normal((B, 100)).astype(
            np.float32)

        def loss_fn(gparams):
            fake, _ = g.apply(gparams, gs, jnp.asarray(z), train=True)
            out, _ = d.apply(dp, ds, fake, train=True, rng=rng)
            return adv(out, 1.0)

        grads = jax.grad(loss_fn)(gp)

        tg = TorchConvG()
        tg.load_jax(gp, gs)
        tg.train()
        td = TorchConvD()
        td.load_jax(dp, ds)
        td.train()
        bcel = torch.nn.BCEWithLogitsLoss()
        out = td(tg(torch.from_numpy(z)), masks=_dropout_masks(rng, B))
        loss = bcel(out, torch.ones(B, 1))
        loss.backward()
        # conv weight gradients reduce ~8k products with heavy cancellation
        # (elements ~1e-3 summing to ~1e-5), so XLA-vs-torch accumulation
        # order yields ~0.3% relative L2 noise at cosine 0.999996 (measured;
        # the low-cancellation c3 grad matches to 2e-6).  A semantic error
        # (wrong eps/stride/momentum) shows up orders of magnitude larger.
        for jg, tm, transpose in ((grads["l1"]["w"], tg.l1, True),
                                  (grads["c1"]["w"], tg.c1, False),
                                  (grads["c2"]["w"], tg.c2, False),
                                  (grads["c3"]["w"], tg.c3, False),
                                  (grads["bn1"]["scale"], tg.bn1, False)):
            a = (_np(jg).T if transpose else _np(jg)).ravel()
            b = tm.weight.grad.detach().numpy().ravel()
            rel_l2 = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)
            cos = float(a @ b) / max(np.linalg.norm(a) * np.linalg.norm(b),
                                     1e-12)
            assert rel_l2 < 0.01, rel_l2
            assert cos > 0.9999, cos
