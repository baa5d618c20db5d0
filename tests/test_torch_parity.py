"""Cross-framework parity: our functional models/losses/optimizer vs exact
torch equivalents of the reference's modules (same weights, same inputs).

This is the SURVEY.md §7.3.1 requirement — the Λ-game math and model
semantics validated against PyTorch-computed values, not just hand algebra.
torch (CPU) is available in the image; these tests build fresh torch modules
shaped like the reference's (model/mnist_model.py etc.), copy OUR weights in,
and require agreement to float tolerance.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cglgan_tpu.algos import common  # noqa: E402
from cglgan_tpu.algos.game import game_step  # noqa: E402
from cglgan_tpu.models import nn as fnn  # noqa: E402
from cglgan_tpu.models.zoo import build_discriminator, build_generator  # noqa: E402


def t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


class TestModelForwardParity:
    def test_mnist_generator_matches_torch(self):
        """Our MNIST MLP G == torch Sequential with BatchNorm1d(d, 0.8)
        (model/mnist_model.py:5-29), weights transplanted."""
        g = build_generator("mnist-mlp")
        params, bn_state = g.init(jax.random.key(0))

        tg = tnn.Sequential(
            tnn.Linear(100, 128), tnn.LeakyReLU(0.2),
            tnn.Linear(128, 256), tnn.BatchNorm1d(256, 0.8), tnn.LeakyReLU(0.2),
            tnn.Linear(256, 512), tnn.BatchNorm1d(512, 0.8), tnn.LeakyReLU(0.2),
            tnn.Linear(512, 1024), tnn.BatchNorm1d(1024, 0.8), tnn.LeakyReLU(0.2),
            tnn.Linear(1024, 784), tnn.Tanh())
        # transplant: our spec order is linear,(bn),lrelu,... params list
        lin_idx = [i for i, p in enumerate(params)
                   if isinstance(p, dict) and "w" in p]
        tlin = [m for m in tg if isinstance(m, tnn.Linear)]
        for i, m in zip(lin_idx, tlin):
            with torch.no_grad():
                m.weight.copy_(t(params[i]["w"]).T)
                m.bias.copy_(t(params[i]["b"]))
        tg.train()

        z = np.random.default_rng(0).normal(size=(64, 100)).astype(np.float32)
        ours, _ = g.apply(params, bn_state, jnp.asarray(z), train=True)
        theirs = tg(t(z)).detach().numpy().reshape(64, 1, 28, 28)
        np.testing.assert_allclose(np.asarray(ours), theirs,
                                   rtol=1e-4, atol=1e-5)

    def test_mnist_discriminator_matches_torch(self):
        d = build_discriminator("mnist", 2)
        params, _ = d.init(jax.random.key(1))
        td = tnn.Sequential(
            tnn.Linear(784, 512), tnn.LeakyReLU(0.2),
            tnn.Linear(512, 256), tnn.LeakyReLU(0.2),
            tnn.Linear(256, 2))
        lin_idx = [i for i, p in enumerate(params)
                   if isinstance(p, dict) and "w" in p]
        for i, m in zip(lin_idx, [m for m in td if isinstance(m, tnn.Linear)]):
            with torch.no_grad():
                m.weight.copy_(t(params[i]["w"]).T)
                m.bias.copy_(t(params[i]["b"]))
        x = np.random.default_rng(1).normal(size=(32, 784)).astype(np.float32)
        ours, _ = d.apply(params, [None] * 5, jnp.asarray(x), train=True)
        theirs = td(t(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs,
                                   rtol=1e-4, atol=1e-5)

    def test_batchnorm_eps_quirk_matches_torch(self):
        """BatchNorm1d(256, 0.8): positional 0.8 is eps, momentum stays 0.1
        (SURVEY.md §7.3.3)."""
        p, s = fnn.bn_init(16)
        tb = tnn.BatchNorm1d(16, 0.8)
        tb.train()
        x = np.random.default_rng(2).normal(2.0, 3.0, (64, 16)
                                            ).astype(np.float32)
        ours, s2 = fnn.batchnorm(p, s, jnp.asarray(x), train=True)
        theirs = tb(t(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s2["mean"]),
                                   tb.running_mean.numpy(), rtol=1e-4,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(s2["var"]),
                                   tb.running_var.numpy(), rtol=1e-4,
                                   atol=1e-5)


class TestLossParity:
    def test_bce(self):
        p = np.random.default_rng(0).uniform(0.01, 0.99, (50, 1)
                                             ).astype(np.float32)
        ours = float(common.bce(jnp.asarray(p), 1.0))
        theirs = float(tnn.BCELoss()(t(p), torch.ones(50, 1)))
        assert abs(ours - theirs) < 1e-6

    def test_ce2(self):
        logits = np.random.default_rng(1).normal(size=(50, 2)
                                                 ).astype(np.float32)
        ours = float(common.ce2(jnp.asarray(logits), 0))
        theirs = float(tnn.CrossEntropyLoss()(
            t(logits), torch.zeros(50, dtype=torch.long)))
        assert abs(ours - theirs) < 1e-6


class TestGameParityWithTorch:
    """The Λ-game formulas recomputed with torch ops (the reference's own
    primitives: F.softmax, tensor algebra) must equal game_step."""

    L = np.array([0.4, 1.3, 0.9, 2.2], np.float32)
    BETA = np.array([0.1, 0.4, 0.2, 0.3], np.float32)
    LAM = 1.3

    def test_cgl_mean_game(self):
        l, beta = t(self.L), t(self.BETA)
        gamma = tF.softmax(torch.tensor(self.LAM) * l, dim=0)
        f_beta = (beta * l).sum()
        f_gamma = (gamma * l).sum()
        grad = (l * l * gamma).sum() - (l * gamma * f_gamma).sum()
        lam_torch = self.LAM + 10 * grad  # CGLGAN/MNIST/main.py:291-292
        out = game_step("cgl_mean_game", jnp.asarray(self.L), self.BETA,
                        self.LAM)
        np.testing.assert_allclose(out.w, ((beta + gamma) / 2).numpy(),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(out.lam_new), float(lam_torch),
                                   rtol=1e-5)

    def test_cap_exp(self):
        l, beta = t(self.L), t(self.BETA)
        alpha = tF.softmax(torch.tensor(self.LAM) * l, dim=0)
        alpha = tF.softmax(alpha * beta, dim=0)  # capgan.py:247-248
        out = game_step("cap_exp", jnp.asarray(self.L), self.BETA, self.LAM)
        np.testing.assert_allclose(out.w, alpha.numpy(), rtol=1e-5)

    def test_cap_lambda_sgd_step(self):
        """torch: SGD(lr=0.1) on F = ... - 0.001*Λ moves Λ by +1e-4."""
        lam = torch.tensor(float(self.LAM), requires_grad=True)
        opt = torch.optim.SGD([lam], lr=0.1)
        loss_term = (t(self.L).detach() * t(self.BETA)).sum()
        f = loss_term - 0.001 * lam
        opt.zero_grad()
        f.backward()
        opt.step()
        out = game_step("cap_exp", jnp.asarray(self.L), self.BETA, self.LAM,
                        lr_lambda=0.1)
        np.testing.assert_allclose(float(out.lam_new), float(lam), rtol=1e-6)

    def test_mix_bll(self):
        l, beta = t(self.L), t(self.BETA)
        alpha = tF.softmax(beta * torch.tensor(self.LAM) * l, dim=0)
        out = game_step("mix_bll", jnp.asarray(self.L), self.BETA, self.LAM)
        np.testing.assert_allclose(out.w, alpha.numpy(), rtol=1e-5)


class TestAdamParity:
    def test_first_steps_match_torch_adam(self):
        """optax.adam(2e-4, 0.5, 0.999) == torch.optim.Adam(same) for the
        reference's settings (CGLGAN/MNIST/main.py:168)."""
        import optax
        w0 = np.random.default_rng(3).normal(size=(32, 16)).astype(np.float32)
        g = np.random.default_rng(4).normal(size=(32, 16)).astype(np.float32)

        tw = torch.from_numpy(w0.copy()).requires_grad_(True)
        topt = torch.optim.Adam([tw], lr=2e-4, betas=(0.5, 0.999))
        for _ in range(3):
            topt.zero_grad()
            tw.grad = torch.from_numpy(g.copy())
            topt.step()

        tx = optax.adam(2e-4, b1=0.5, b2=0.999)
        p = jnp.asarray(w0)
        st = tx.init(p)
        for _ in range(3):
            up, st = tx.update(jnp.asarray(g), st, p)
            p = optax.apply_updates(p, up)
        np.testing.assert_allclose(np.asarray(p), tw.detach().numpy(),
                                   rtol=1e-5, atol=1e-7)
