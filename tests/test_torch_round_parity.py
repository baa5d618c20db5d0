"""Full CGL generator-update parity against a torch twin.

Rebuilds the reference's trunk/heads freeze dance (CGLGAN/MNIST/main.py:
272-294) in torch on a 2DMG-sized multipath generator, transplants this
framework's weights and discriminator outputs, and requires the *updated
generator parameters* after one Adam step to match our dual-cotangent VJP
implementation to float tolerance.  This covers, in one shot: multipath
routing, per-client BCE losses, the gamma/beta game weights, heads-from-sum /
trunk-from-weighted-sum gradient split, and the shared Adam step.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from cglgan_tpu.algos.common import bce  # noqa: E402
from cglgan_tpu.algos.game import game_step  # noqa: E402
from cglgan_tpu.models.zoo import build_discriminator, build_generator  # noqa: E402

K = 3          # clients / heads
B = 16
LAM = 0.8
BETA = np.array([0.5, 0.3, 0.2], np.float32)


class TorchMultipathG(tnn.Module):
    """Reference-shaped 2DMG multipath G: trunk 100-32+LReLU, K heads
    32-2+Tanh (CGLGAN/2DMG/model.py:26-50)."""

    def __init__(self):
        super().__init__()
        self.model = tnn.Sequential(tnn.Linear(100, 32), tnn.LeakyReLU(0.2))
        self.paths = tnn.ModuleList(
            [tnn.Sequential(tnn.Linear(32, 2), tnn.Tanh()) for _ in range(K)])

    def forward(self, z):
        h = self.model(z)
        return torch.cat([p(h) for p in self.paths], dim=0)


def _torch_d(dp):
    """Torch twin of our 2DMG sigmoid D with transplanted weights."""
    td = tnn.Sequential(tnn.Linear(2, 128), tnn.LeakyReLU(0.2),
                        tnn.Linear(128, 256), tnn.LeakyReLU(0.2),
                        tnn.Linear(256, 1), tnn.Sigmoid())
    lins = [m for m in td if isinstance(m, tnn.Linear)]
    lin_params = [p for p in dp if isinstance(p, dict) and "w" in p]
    for m, p in zip(lins, lin_params):
        with torch.no_grad():
            m.weight.copy_(torch.from_numpy(np.asarray(p["w"]).T))
            m.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
    return td


class TestCGLRoundParity:
    def test_generator_update_matches_torch_freeze_dance(self):
        g = build_generator("2dmg-multipath", num_heads=K)
        d = build_discriminator("2dmg")
        gp, gbn = g.init(jax.random.key(0))

        # K distinct client discriminators
        dps = [d.init(jax.random.key(10 + i))[0] for i in range(K)]
        z = np.random.default_rng(0).normal(size=(B, 100)).astype(np.float32)

        # ---- torch twin ----
        tg = TorchMultipathG()
        with torch.no_grad():
            tg.model[0].weight.copy_(
                torch.from_numpy(np.asarray(gp["trunk"][0]["w"]).T))
            tg.model[0].bias.copy_(
                torch.from_numpy(np.asarray(gp["trunk"][0]["b"])))
            for i in range(K):
                tg.paths[i][0].weight.copy_(torch.from_numpy(
                    np.asarray(gp["heads"][0]["w"][i]).T))
                tg.paths[i][0].bias.copy_(torch.from_numpy(
                    np.asarray(gp["heads"][0]["b"][i])))
        tds = [_torch_d(dp) for dp in dps]
        opti = torch.optim.Adam(tg.parameters(), lr=2e-4, betas=(0.5, 0.999))
        loss_fn = tnn.BCELoss()

        xg = torch.chunk(tg(torch.from_numpy(z)), K, dim=0)
        valid = torch.ones(B, 1)
        losses = torch.zeros(K)
        graph = []
        for i in range(K):
            gl = loss_fn(tds[i](xg[i]), valid)
            losses[i] = gl.detach()
            graph.append(gl)
        opti.zero_grad()
        # heads <- sum(l) with trunk frozen (main.py:272-276)
        tg.model.requires_grad_(False)
        sum(graph).backward(retain_graph=True)
        tg.model.requires_grad_(True)
        # trunk <- (F_beta + F_gamma)/2 with heads frozen (main.py:279-289)
        gamma = tF.softmax(torch.tensor(LAM) * losses, dim=0).detach()
        beta = torch.from_numpy(BETA)
        f_max = ((beta * torch.stack(graph)).sum()
                 + (gamma * torch.stack(graph)).sum()) / 2
        for p in tg.paths.parameters():
            p.requires_grad_(False)
        f_max.backward()
        for p in tg.paths.parameters():
            p.requires_grad_(True)
        opti.step()

        # ---- ours: single forward, two VJP pullbacks ----
        def losses_fn(params):
            fake, _ = g.apply(params, gbn, jnp.asarray(z), train=True)
            ls = []
            for i in range(K):
                out, _ = d.apply(dps[i], [None] * 6, fake[i], train=True)
                ls.append(bce(out, 1.0))
            return jnp.stack(ls)

        l0, pullback = jax.vjp(losses_fn, gp)
        game = game_step("cgl_mean_game", l0, BETA, LAM)
        g_heads = pullback(jnp.ones_like(l0))[0]
        g_trunk = pullback(game.w)[0]
        grads = {"trunk": g_trunk["trunk"], "heads": g_heads["heads"]}
        tx = optax.adam(2e-4, b1=0.5, b2=0.999)
        up, _ = tx.update(grads, tx.init(gp), gp)
        new_gp = optax.apply_updates(gp, up)

        # per-client losses must agree first
        np.testing.assert_allclose(np.asarray(l0), losses.numpy(),
                                   rtol=1e-5, atol=1e-6)
        # updated trunk
        np.testing.assert_allclose(
            np.asarray(new_gp["trunk"][0]["w"]),
            tg.model[0].weight.detach().numpy().T, rtol=1e-4, atol=1e-6)
        # updated heads
        for i in range(K):
            np.testing.assert_allclose(
                np.asarray(new_gp["heads"][0]["w"][i]),
                tg.paths[i][0].weight.detach().numpy().T,
                rtol=1e-4, atol=1e-6)
