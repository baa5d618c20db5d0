"""Multi-round trajectory parity: the jitted rounds vs torch protocol twins.

The one-step parity tests (tests/test_torch_round_parity.py) certify that a
single generator/discriminator update matches torch to float tolerance.  This
module certifies the *trajectory*: it re-creates the reference's full
CGL-GAN 2DMG protocol (CGLGAN/2DMG/main.py:103-375 — cloud sync, per-client
D steps, the trunk/heads freeze dance, the manual Lambda ascent) and the full
FL-GAN protocol (FLGAN/2DMG/flgan.py:107-258 — broadcast, local D/G sweeps
with persistent per-worker Adam state, uniform FedAvg) in eager torch, runs
both implementations for hundreds of rounds from IDENTICAL initial weights
with IDENTICAL latent/batch streams, and compares the KL-Score /
Distribution-Score trajectories at every eval tick.

Identical streams: every random draw inside the jitted rounds derives
deterministically from (seed, round, role) via ``core.prng`` fold-ins, so the
same draws are re-computed on the host (threefry is backend-independent) and
fed to the torch twin as plain numpy arrays.  The twins are fresh torch code
written against the reference protocol shape — not copies.

Run as a script to print the curves recorded in RESULTS.md:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m benchmarks.trajectory_parity
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# ---------------------------------------------------------------------------
# stream extraction (host-side mirror of the in-round PRNG discipline)
# ---------------------------------------------------------------------------

def cgl_round_streams(root, cfg, max_len: int):
    """Per-round (starts, z_d, z_g) exactly as algos.cgl_family.round_fn
    draws them: starts (epoch,) int, z_d/z_g (S, B, zdim) float32."""
    import jax
    from cglgan_tpu.algos import common
    from cglgan_tpu.core import prng

    S, B, zdim = cfg.num_servers, cfg.batch_size, cfg.latent_dim

    def at(t):
        key = prng.for_round(prng.for_role(root, prng.ROLE_LOCAL), t)
        bkeys = jax.random.split(prng.for_role(key, prng.ROLE_BATCH),
                                 cfg.epoch)
        starts = np.asarray([int(common.batch_start(kk, max_len, B))
                             for kk in bkeys])
        keys = jax.random.split(key, S)
        z_d, z_g = [], []
        for s in range(S):
            k_zd, k_zg, _k_d, _k_drop = jax.random.split(keys[s], 4)
            z_d.append(np.asarray(jax.random.normal(k_zd, (B, zdim))))
            z_g.append(np.asarray(jax.random.normal(k_zg, (B, zdim))))
        return starts, np.stack(z_d), np.stack(z_g)

    return at


def flgan_round_streams(root, cfg, max_len: int, max_steps: int = None):
    """Per-round (starts, z1, z2) as algos.fedavg_family draws them:
    starts (steps,), z1/z2 (W, steps, B, zdim) — z1 feeds the D step's fake
    batch, z2 the G step.  ``max_steps``: the ragged "epochs" sweep's
    max-over-workers step count (defaults to cfg.epoch, the 2DMG "batches"
    semantics)."""
    import jax
    from cglgan_tpu.algos import common
    from cglgan_tpu.core import prng

    W, B, zdim = cfg.num_workers, cfg.batch_size, cfg.latent_dim
    steps = max_steps if max_steps is not None else cfg.epoch

    def at(t):
        key = prng.for_round(prng.for_role(root, prng.ROLE_LOCAL), t)
        keys = jax.random.split(key, W)
        starts = np.asarray([
            int(common.batch_start(kk, max_len, B)) for kk in
            jax.random.split(prng.for_role(key, prng.ROLE_BATCH), steps)])
        z1 = np.zeros((W, steps, B, zdim), np.float32)
        z2 = np.zeros((W, steps, B, zdim), np.float32)
        for w in range(W):
            skeys = jax.random.split(keys[w], steps)
            for i in range(steps):
                kzd, kzg, _, _ = jax.random.split(skeys[i], 4)
                z1[w, i] = np.asarray(jax.random.normal(kzd, (B, zdim)))
                z2[w, i] = np.asarray(jax.random.normal(kzg, (B, zdim)))
        return starts, z1, z2

    return at


def eval_z(root, cfg):
    """The fixed eval latents each implementation samples with."""
    import jax
    from cglgan_tpu.core import prng

    n, zdim, S = cfg.num_sample, cfg.latent_dim, cfg.num_servers
    if cfg.algo in ("cglgan", "capgan", "mixgan", "mdgan", "acgan"):
        per = max(n // S, 1)
        return np.stack([
            np.asarray(jax.random.normal(
                prng.for_member(prng.for_role(root, prng.ROLE_EVAL), i),
                (per, zdim))) for i in range(S)])
    return np.asarray(jax.random.normal(
        prng.for_role(root, prng.ROLE_EVAL), (n, zdim)))


# ---------------------------------------------------------------------------
# torch twins (fresh code against the reference protocol shape)
# ---------------------------------------------------------------------------

def _torch():
    import torch
    torch.set_num_threads(1)
    return torch


def _t_multipath_g(torch, k):
    import torch.nn as tnn

    class G(tnn.Module):
        def __init__(self):
            super().__init__()
            self.trunk = tnn.Sequential(tnn.Linear(100, 32),
                                        tnn.LeakyReLU(0.2))
            self.heads = tnn.ModuleList([
                tnn.Sequential(tnn.Linear(32, 2), tnn.Tanh())
                for _ in range(k)])

        def forward(self, z):          # (k, B, 2): head i -> client i
            h = self.trunk(z)
            return torch.stack([p(h) for p in self.heads], 0)

    return G()


def _t_flgan_g(torch):
    import torch.nn as tnn
    return tnn.Sequential(tnn.Linear(100, 256), tnn.LeakyReLU(0.2),
                          tnn.Linear(256, 128), tnn.LeakyReLU(0.2),
                          tnn.Linear(128, 2), tnn.Tanh())


def _t_small_g(torch):
    import torch.nn as tnn
    return tnn.Sequential(tnn.Linear(100, 32), tnn.LeakyReLU(0.2),
                          tnn.Linear(32, 2), tnn.Tanh())


def _t_2dmg_d(torch):
    import torch.nn as tnn
    return tnn.Sequential(tnn.Linear(2, 128), tnn.LeakyReLU(0.2),
                          tnn.Linear(128, 256), tnn.LeakyReLU(0.2),
                          tnn.Linear(256, 1), tnn.Sigmoid())


def _t_mnist_g(torch):
    """The reference MNIST MLP G (model/mnist_model.py:5-28): 100-128-256-
    512-1024-784, BatchNorm1d(h, 0.8) — positionally eps=0.8, the DCGAN-code
    quirk — on all but the first block, LeakyReLU(0.2), Tanh."""
    import torch.nn as tnn
    return tnn.Sequential(
        tnn.Linear(100, 128), tnn.LeakyReLU(0.2),
        tnn.Linear(128, 256), tnn.BatchNorm1d(256, 0.8), tnn.LeakyReLU(0.2),
        tnn.Linear(256, 512), tnn.BatchNorm1d(512, 0.8), tnn.LeakyReLU(0.2),
        tnn.Linear(512, 1024), tnn.BatchNorm1d(1024, 0.8),
        tnn.LeakyReLU(0.2),
        tnn.Linear(1024, 784), tnn.Tanh())


def _t_mnist_d(torch, out_dim):
    import torch.nn as tnn
    return tnn.Sequential(tnn.Linear(784, 512), tnn.LeakyReLU(0.2),
                          tnn.Linear(512, 256), tnn.LeakyReLU(0.2),
                          tnn.Linear(256, out_dim))


def _copy_mnist_g(torch, tg, gp, gbn, idx=None):
    """Copy jax mnist-mlp params+BN state (optionally indexed on a leading
    stacked axis) into the torch twin."""
    take = (lambda x: np.asarray(x)) if idx is None else \
        (lambda x: np.asarray(x)[idx])
    lins = [m for m in tg if m.__class__.__name__ == "Linear"]
    bns = [m for m in tg if m.__class__.__name__ == "BatchNorm1d"]
    jl = [p for p in gp if isinstance(p, dict) and "w" in p]
    jb = [p for p in gp if isinstance(p, dict) and "scale" in p]
    js = [s for s in gbn if isinstance(s, dict)]
    with torch.no_grad():
        for m, p in zip(lins, jl):
            m.weight.copy_(torch.from_numpy(take(p["w"]).T.copy()))
            m.bias.copy_(torch.from_numpy(take(p["b"]).copy()))
        for m, p, s in zip(bns, jb, js):
            m.weight.copy_(torch.from_numpy(take(p["scale"]).copy()))
            m.bias.copy_(torch.from_numpy(take(p["bias"]).copy()))
            m.running_mean.copy_(torch.from_numpy(take(s["mean"]).copy()))
            m.running_var.copy_(torch.from_numpy(take(s["var"]).copy()))


def _t_normalize(torch, u8):
    """uint8 (B, 784) -> [-1, 1] float, the reference ToTensor+Normalize
    (capgan.py:466-469)."""
    x = torch.from_numpy(u8.astype(np.float32) / 255.0)
    return (x - 0.5) / 0.5


def _copy_linear(torch, module, p):
    with torch.no_grad():
        module.weight.copy_(torch.from_numpy(np.asarray(p["w"]).T.copy()))
        module.bias.copy_(torch.from_numpy(np.asarray(p["b"]).copy()))


def _copy_seq_d(torch, td, dp):
    lins = [m for m in td if m.__class__.__name__ == "Linear"]
    lin_params = [p for p in dp if isinstance(p, dict) and "w" in p]
    for m, p in zip(lins, lin_params):
        _copy_linear(torch, m, p)


class TorchCGLTwin:
    """The reference CGL-GAN 2DMG protocol in eager torch, consuming
    externally supplied latent/batch streams (CGLGAN/2DMG/main.py:103-375).

    Subclass hooks: ``d_half`` (CAP/Mix halve the D loss, capgan.py:339) and
    ``_game`` (the per-variant Lambda weighting)."""

    d_half = False

    def __init__(self, cfg, part, jax_state):
        torch = self.torch = _torch()
        import torch.nn as tnn
        from cglgan_tpu.fed import topology

        self.cfg = cfg
        S, self.k = cfg.num_servers, cfg.clients_per_server
        self.S, k = S, self.k
        self.B = cfg.batch_size
        self.shards = np.asarray(part.data).reshape(
            (S, k) + part.data.shape[1:])
        self.beta = topology.server_beta(part.lengths, S)        # (S, k)
        dl = topology.server_data_len(part.lengths, S)
        self.a_w = (dl / dl.sum()).astype(np.float32)            # (S,)
        self.lam = np.zeros(S, np.float32)
        self.bce = tnn.BCELoss()

        gp = jax_state.g.params
        dp = jax_state.d.params
        self.G, self.optG, self.D, self.optD = [], [], [], []
        for s in range(S):
            g = _t_multipath_g(torch, k)
            _copy_linear(torch, g.trunk[0],
                         {"w": np.asarray(gp["trunk"][0]["w"])[s],
                          "b": np.asarray(gp["trunk"][0]["b"])[s]})
            for i in range(k):
                _copy_linear(torch, g.heads[i][0],
                             {"w": np.asarray(gp["heads"][0]["w"])[s, i],
                              "b": np.asarray(gp["heads"][0]["b"])[s, i]})
            self.G.append(g)
            self.optG.append(torch.optim.Adam(
                g.parameters(), lr=cfg.lr_g, betas=(cfg.b1, cfg.b2)))
            ds_row, opt_row = [], []
            for i in range(k):
                d = _t_2dmg_d(torch)
                _copy_seq_d(torch, d, [
                    None if x is None else
                    {kk: np.asarray(vv)[s, i] for kk, vv in x.items()}
                    for x in dp])
                ds_row.append(d)
                opt_row.append(torch.optim.Adam(
                    d.parameters(), lr=cfg.lr_d, betas=(cfg.b1, cfg.b2)))
            self.D.append(ds_row)
            self.optD.append(opt_row)

    def _cloud_sync(self, t):
        """Weighted trunk average + sigma-mix every cloud_epoch rounds
        (CGLGAN/MNIST/main.py:100-112,177-184)."""
        cfg, torch = self.cfg, self.torch
        # countdown phase: the reference syncs when (T - i) % period == 0
        # (CGLGAN/MNIST/main.py:166,177)
        if cfg.cloud_epoch <= 0 or \
                (cfg.num_communication - t) % max(cfg.cloud_epoch, 1) != 0:
            return
        with torch.no_grad():
            avg_w = sum(float(self.a_w[s]) * self.G[s].trunk[0].weight
                        for s in range(self.S))
            avg_b = sum(float(self.a_w[s]) * self.G[s].trunk[0].bias
                        for s in range(self.S))
            for s in range(self.S):
                tr = self.G[s].trunk[0]
                tr.weight.copy_(cfg.segema * tr.weight
                                + (1 - cfg.segema) * avg_w)
                tr.bias.copy_(cfg.segema * tr.bias
                              + (1 - cfg.segema) * avg_b)

    def _game(self, s, l):
        """cgl_mean_game: gamma = softmax(Lambda*l); w = (beta+gamma)/2;
        manual ascent Lambda += 10*[sum(l^2 g) - sum(l g)*F_gamma]
        (CGLGAN/MNIST/main.py:279-292).  Returns the constant weights w and
        updates self.lam[s] in place."""
        torch = self.torch
        gamma = torch.softmax(torch.tensor(self.lam[s]) * l, dim=0)
        w = (torch.from_numpy(self.beta[s]) + gamma) / 2.0
        f_gamma = (gamma * l).sum()
        self.lam[s] += 10.0 * float((l * l * gamma).sum()
                                    - (l * gamma).sum() * f_gamma)
        return w

    def round(self, t, starts, z_d, z_g):
        torch, cfg, k = self.torch, self.cfg, self.k
        self._cloud_sync(t)
        valid = torch.ones(self.B, 1)
        fake_t = torch.zeros(self.B, 1)
        for s in range(self.S):
            g, optg = self.G[s], self.optG[s]
            # Xd: detached fake batch, head i routed to client i
            xd = g(torch.from_numpy(z_d[s])).detach()
            for i in range(k):
                d, optd = self.D[s][i], self.optD[s][i]
                for e in range(cfg.epoch):
                    st = int(starts[e])
                    real = torch.from_numpy(
                        self.shards[s, i, st:st + self.B].copy())
                    loss = self.bce(d(real), valid) \
                        + self.bce(d(xd[i]), fake_t)
                    if self.d_half:
                        loss = loss * 0.5
                    optd.zero_grad()
                    loss.backward()
                    optd.step()
            # generator: per-client losses through the UPDATED Ds
            xg = g(torch.from_numpy(z_g[s]))
            graph = [self.bce(self.D[s][i](xg[i]), valid) for i in range(k)]
            l = torch.stack(graph).detach()
            w = self._game(s, l)
            optg.zero_grad()
            # heads <- sum(l) with trunk frozen; trunk <- sum(w*l) with heads
            # frozen (the reference freeze dance, main.py:272-289)
            g.trunk.requires_grad_(False)
            sum(graph).backward(retain_graph=True)
            g.trunk.requires_grad_(True)
            g.heads.requires_grad_(False)
            (w * torch.stack(graph)).sum().backward()
            g.heads.requires_grad_(True)
            optg.step()

    def sample(self, zs):
        """Painter semantics: per server G(fixed_z), heads interleaved back
        down to the per-server quota (capgan.py:79-83)."""
        torch, k = self.torch, self.k
        outs = []
        with torch.no_grad():
            for s in range(self.S):
                out = self.G[s](torch.from_numpy(zs[s]))      # (k, per, 2)
                per = out.shape[1]
                outs.append(out.reshape(k * per, 2)[::k].numpy())
        return np.concatenate(outs, axis=0)


class TorchMixGANTwin(TorchCGLTwin):
    """The reference Mix-G 2DMG protocol (mixed-gan.py:91-393): same 3-tier
    multipath shape as CGL-GAN but the D loss is halved (mixed-gan.py:382),
    the trunk objective is F = sum(softmax(beta*Lambda*l) * l) - 0.001*Lambda
    and Lambda is an SGD(lr_lambda) parameter whose only F-gradient is the
    constant -0.001 (mixed-gan.py:276-286).  The DCGAN weights_init the
    reference applies (mixed-gan.py:181,348) is inherited by copying the jax
    initial state, exactly like every other twin."""

    d_half = True

    def _game(self, s, l):
        torch = self.torch
        if self.cfg.resolved_weighting == "beta_gamma":
            # CAPGAN/MNIST/mixed-gan.py:276-278 — gamma = softmax(Lambda*l),
            # s = softmax(beta*gamma); Lambda's only F-gradient is -0.001
            gamma = torch.softmax(torch.tensor(self.lam[s]) * l, dim=0)
            w = torch.softmax(torch.from_numpy(self.beta[s]) * gamma, dim=0)
        else:
            w = torch.softmax(torch.from_numpy(self.beta[s])
                              * torch.tensor(self.lam[s]) * l, dim=0)
        self.lam[s] += self.cfg.lr_lambda * 0.001
        return w


class TorchCAPGANTwin:
    """The reference CAP-GAN 2DMG protocol in eager torch (capgan.py:86-349):
    single-path G per edge server, the full detached fake batch broadcast to
    every client (capgan.py:224-225), halved D loss (capgan.py:339),
    G objective F = sum(alpha*l) - 0.001*Lambda with
    alpha = softmax(softmax(Lambda*l)*beta) on detached l (capgan.py:247-259),
    and cloud sync of the FULL generator on the data-size-scaled cadence
    t % (data_len*cloud_epoch/B) == 0 (capgan.py:169) — servers whose cadence
    fires this round average (weights renormalised over the firing set) and
    sigma-mix the average back in, matching algos/cgl_family.cloud_sync."""

    def __init__(self, cfg, part, jax_state):
        torch = self.torch = _torch()
        import torch.nn as tnn
        from cglgan_tpu.fed import topology

        self.cfg = cfg
        S, self.k = cfg.num_servers, cfg.clients_per_server
        self.S, k = S, self.k
        self.B = cfg.batch_size
        self.shards = np.asarray(part.data).reshape(
            (S, k) + part.data.shape[1:])
        self.beta = topology.server_beta(part.lengths, S)        # (S, k)
        dl = topology.server_data_len(part.lengths, S)
        self.a_w = (dl / dl.sum()).astype(np.float32)            # (S,)
        self.periods = np.maximum(
            1, (dl * cfg.cloud_epoch / cfg.batch_size).astype(np.int64))
        self.lam = np.zeros(S, np.float32)
        self.bce = tnn.BCELoss()

        gp, dp = jax_state.g.params, jax_state.d.params
        self.G, self.optG, self.D, self.optD = [], [], [], []
        for s in range(S):
            g = _t_small_g(torch)
            lins = [m for m in g if m.__class__.__name__ == "Linear"]
            for m, p in zip(lins, [x for x in gp
                                   if isinstance(x, dict) and "w" in x]):
                _copy_linear(torch, m, {kk: np.asarray(vv)[s]
                                        for kk, vv in p.items()})
            self.G.append(g)
            self.optG.append(torch.optim.Adam(
                g.parameters(), lr=cfg.lr_g, betas=(cfg.b1, cfg.b2)))
            ds_row, opt_row = [], []
            for i in range(k):
                d = _t_2dmg_d(torch)
                _copy_seq_d(torch, d, [
                    None if x is None else
                    {kk: np.asarray(vv)[s, i] for kk, vv in x.items()}
                    for x in dp])
                ds_row.append(d)
                opt_row.append(torch.optim.Adam(
                    d.parameters(), lr=cfg.lr_d, betas=(cfg.b1, cfg.b2)))
            self.D.append(ds_row)
            self.optD.append(opt_row)

    def _cloud_sync(self, t):
        cfg, torch = self.cfg, self.torch
        if cfg.cloud_epoch <= 0:
            return
        # countdown phase (capgan.py:155,169); fedlab serialize_model moves
        # model.parameters() ONLY (capgan.py:170-175) — state_dict buffers
        # (none for this MLP G) would be wrong here
        mask = ((cfg.num_communication - t) % self.periods) == 0  # (S,)
        if not mask.any():
            return
        wts = self.a_w * mask
        wts = wts / wts.sum()
        with torch.no_grad():
            pds = [dict(g.named_parameters()) for g in self.G]
            avg = {k_: sum(float(wts[s]) * pds[s][k_]
                           for s in range(self.S) if wts[s] > 0)
                   for k_ in pds[0]}
            for s in range(self.S):
                if not mask[s]:
                    continue
                for k_, v in pds[s].items():
                    v.copy_(cfg.segema * v + (1 - cfg.segema) * avg[k_])

    def round(self, t, starts, z_d, z_g):
        torch, cfg, k = self.torch, self.cfg, self.k
        self._cloud_sync(t)
        valid = torch.ones(self.B, 1)
        fake_t = torch.zeros(self.B, 1)
        for s in range(self.S):
            g, optg = self.G[s], self.optG[s]
            xd = g(torch.from_numpy(z_d[s])).detach()     # full batch to all
            for i in range(k):
                d, optd = self.D[s][i], self.optD[s][i]
                for e in range(cfg.epoch):
                    st = int(starts[e])
                    real = torch.from_numpy(
                        self.shards[s, i, st:st + self.B].copy())
                    loss = 0.5 * (self.bce(d(real), valid)
                                  + self.bce(d(xd), fake_t))
                    optd.zero_grad()
                    loss.backward()
                    optd.step()
            xg = g(torch.from_numpy(z_g[s]))
            graph = [self.bce(self.D[s][i](xg), valid) for i in range(k)]
            l = torch.stack(graph).detach()
            alpha = self._weights(s, l)
            optg.zero_grad()
            (alpha * torch.stack(graph)).sum().backward()
            optg.step()
            self.lam[s] += cfg.lr_lambda * 0.001

    def _weights(self, s, l):
        """cap_exp (capgan.py:247-259) or the CAPGAN/MNIST variant's
        beta_gamma (CAPGAN/MNIST/capgan.py:241-243); both detach every
        softmax argument, so Lambda's only F-gradient is the -0.001."""
        torch = self.torch
        if self.cfg.resolved_weighting == "beta_gamma":
            gamma = torch.softmax(torch.tensor(self.lam[s]) * l, dim=0)
            return torch.softmax(torch.from_numpy(self.beta[s]) * gamma,
                                 dim=0)
        inner = torch.softmax(torch.tensor(self.lam[s]) * l, dim=0)
        return torch.softmax(inner * torch.from_numpy(self.beta[s]), dim=0)

    def sample(self, zs):
        torch = self.torch
        outs = []
        with torch.no_grad():
            for s in range(self.S):
                outs.append(self.G[s](torch.from_numpy(zs[s].copy())).numpy())
        return np.concatenate(outs, axis=0)


class TorchACGANTwin:
    """The reference AC-GAN 2DMG protocol in eager torch
    (ACGAN/2DMG/acgan.py:102-257): S servers each own a small G
    (100-32-2, ACGAN/2DMG/model.py:4-20) and serve a block of k clients;
    per round each server broadcasts Xd (detached) + Xg, the clients train
    their Ds ``epoch`` steps on (real, Xd), and the server means the clients'
    BCE(D_i(Xg), 1) losses through the UPDATED Ds, backprops and steps."""

    def __init__(self, cfg, part, jax_state):
        torch = self.torch = _torch()
        import torch.nn as tnn
        self.cfg = cfg
        S, self.k = cfg.num_servers, cfg.clients_per_server
        self.S, k = S, self.k
        self.B = cfg.batch_size
        self.shards = np.asarray(part.data).reshape(
            (S, k) + part.data.shape[1:])
        self.bce = tnn.BCELoss()

        gp, dp = jax_state.g.params, jax_state.d.params
        self.G, self.optG, self.D, self.optD = [], [], [], []
        for s in range(S):
            g = _t_small_g(torch)
            lins = [m for m in g if m.__class__.__name__ == "Linear"]
            for m, p in zip(lins, [x for x in gp
                                   if isinstance(x, dict) and "w" in x]):
                _copy_linear(torch, m, {kk: np.asarray(vv)[s]
                                        for kk, vv in p.items()})
            self.G.append(g)
            self.optG.append(torch.optim.Adam(
                g.parameters(), lr=cfg.lr_g, betas=(cfg.b1, cfg.b2)))
            ds_row, opt_row = [], []
            for i in range(k):
                d = _t_2dmg_d(torch)
                _copy_seq_d(torch, d, [
                    None if x is None else
                    {kk: np.asarray(vv)[s, i] for kk, vv in x.items()}
                    for x in dp])
                ds_row.append(d)
                opt_row.append(torch.optim.Adam(
                    d.parameters(), lr=cfg.lr_d, betas=(cfg.b1, cfg.b2)))
            self.D.append(ds_row)
            self.optD.append(opt_row)

    def round(self, t, starts, z_d, z_g):
        torch, cfg, k = self.torch, self.cfg, self.k
        valid = torch.ones(self.B, 1)
        fake_t = torch.zeros(self.B, 1)
        for s in range(self.S):
            g, optg = self.G[s], self.optG[s]
            xd = g(torch.from_numpy(z_d[s])).detach()
            for i in range(k):
                d, optd = self.D[s][i], self.optD[s][i]
                for e in range(cfg.epoch):
                    st = int(starts[e])
                    real = torch.from_numpy(
                        self.shards[s, i, st:st + self.B].copy())
                    loss = self.bce(d(real), valid) + self.bce(d(xd), fake_t)
                    optd.zero_grad()
                    loss.backward()
                    optd.step()
            xg = g(torch.from_numpy(z_g[s]))
            g_loss = torch.stack(
                [self.bce(self.D[s][i](xg), valid) for i in range(k)]).mean()
            optg.zero_grad()
            g_loss.backward()
            optg.step()

    def sample(self, zs):
        torch = self.torch
        outs = []
        with torch.no_grad():
            for s in range(self.S):
                outs.append(self.G[s](torch.from_numpy(zs[s].copy())).numpy())
        return np.concatenate(outs, axis=0)


class TorchCAPGANMNISTTwin(TorchCAPGANTwin):
    """CAP-GAN on the MNIST-shaped workload (capgan.py:86-349): BN(eps 0.8)
    generator (model/mnist_model.py:5-28), 2-logit D + CrossEntropyLoss
    (capgan.py:311), ToTensor+Normalize reals, halved D loss, cap_exp
    weighting and the full-G cloud sync — certifying the train-mode
    BatchNorm semantics (batch stats + running-stat updates, including the
    no-grad Xd forward) across a multi-round trajectory."""

    def __init__(self, cfg, part, jax_state):
        torch = self.torch = _torch()
        import torch.nn as tnn
        from cglgan_tpu.fed import topology

        self.cfg = cfg
        S, self.k = cfg.num_servers, cfg.clients_per_server
        self.S, k = S, self.k
        self.B = cfg.batch_size
        self.shards = np.asarray(part.data).reshape(
            (S, k) + part.data.shape[1:])
        self.beta = topology.server_beta(part.lengths, S)
        dl = topology.server_data_len(part.lengths, S)
        self.a_w = (dl / dl.sum()).astype(np.float32)
        self.periods = np.maximum(
            1, (dl * cfg.cloud_epoch / cfg.batch_size).astype(np.int64))
        self.lam = np.zeros(S, np.float32)
        self.ce = tnn.CrossEntropyLoss()

        gp, gbn = jax_state.g.params, jax_state.g.bn
        dp = jax_state.d.params
        self.G, self.optG, self.D, self.optD = [], [], [], []
        for s in range(S):
            g = _t_mnist_g(torch)
            _copy_mnist_g(torch, g, gp, gbn, idx=s)
            self.G.append(g)
            self.optG.append(torch.optim.Adam(
                g.parameters(), lr=cfg.lr_g, betas=(cfg.b1, cfg.b2)))
            ds_row, opt_row = [], []
            for i in range(k):
                d = _t_mnist_d(torch, 2)
                _copy_seq_d(torch, d, [
                    None if x is None else
                    {kk: np.asarray(vv)[s, i] for kk, vv in x.items()}
                    for x in dp])
                ds_row.append(d)
                opt_row.append(torch.optim.Adam(
                    d.parameters(), lr=cfg.lr_d, betas=(cfg.b1, cfg.b2)))
            self.D.append(ds_row)
            self.optD.append(opt_row)

    def _cloud_sync(self, t):
        cfg, torch = self.cfg, self.torch
        if cfg.cloud_epoch <= 0:
            return
        # countdown phase (capgan.py:155,169)
        mask = ((cfg.num_communication - t) % self.periods) == 0
        if not mask.any():
            return
        wts = self.a_w * mask
        wts = wts / wts.sum()
        with torch.no_grad():
            # fedlab serialize_model transports model.parameters() ONLY
            # (capgan.py:170-175): BN running_mean/var stay LOCAL to each
            # server — unlike cglgan's copy_parameters state_dict walk
            pds = [dict(g.named_parameters()) for g in self.G]
            avg = {k_: sum(float(wts[s]) * pds[s][k_]
                           for s in range(self.S) if wts[s] > 0)
                   for k_ in pds[0]}
            for s in range(self.S):
                if not mask[s]:
                    continue
                for k_ in pds[s]:
                    v = pds[s][k_]
                    v.copy_(cfg.segema * v + (1 - cfg.segema) * avg[k_])

    def round(self, t, starts, z_d, z_g):
        torch, cfg, k = self.torch, self.cfg, self.k
        self._cloud_sync(t)
        ones = torch.ones(self.B, dtype=torch.long)
        zeros = torch.zeros(self.B, dtype=torch.long)
        for s in range(self.S):
            g, optg = self.G[s], self.optG[s]
            with torch.no_grad():     # Xd: train-mode fwd advances BN stats
                xd = g(torch.from_numpy(z_d[s]))
            for i in range(k):
                d, optd = self.D[s][i], self.optD[s][i]
                for e in range(cfg.epoch):
                    st = int(starts[e])
                    real = _t_normalize(
                        torch, self.shards[s, i, st:st + self.B])
                    loss = 0.5 * (self.ce(d(real), ones)
                                  + self.ce(d(xd), zeros))
                    optd.zero_grad()
                    loss.backward()
                    optd.step()
            xg = g(torch.from_numpy(z_g[s]))
            graph = [self.ce(self.D[s][i](xg), ones) for i in range(k)]
            l = torch.stack(graph).detach()
            alpha = self._weights(s, l)
            optg.zero_grad()
            (alpha * torch.stack(graph)).sum().backward()
            optg.step()
            self.lam[s] += cfg.lr_lambda * 0.001

    def sample(self, zs):
        torch = self.torch
        outs = []
        with torch.no_grad():
            for s in range(self.S):
                self.G[s].eval()
                outs.append(self.G[s](
                    torch.from_numpy(zs[s].copy())).numpy())
                self.G[s].train()
        return np.concatenate(outs, axis=0)


class TorchFLGANMNISTTwin:
    """FL-GAN on the MNIST-shaped workload (FLGAN/MNIST/flgan.py:107-270):
    broadcast -> ``epoch`` full RAGGED local epochs per worker
    (ceil(len_w/B) steps — the 'epochs' sweep semantics, distinct from the
    2DMG 'batches' variant) -> uniform FedAvg of params AND BN buffers."""

    def __init__(self, cfg, part, jax_state, steps_per_worker):
        torch = self.torch = _torch()
        import torch.nn as tnn
        self.cfg = cfg
        self.W = cfg.num_workers
        self.B = cfg.batch_size
        self.shards = np.asarray(part.data)
        self.steps = np.asarray(steps_per_worker)
        self.bce = tnn.BCELoss()

        gp, gbn, dp = jax_state.g.params, jax_state.g.bn, jax_state.d.params
        self.G = [_t_mnist_g(torch) for _ in range(self.W)]
        self.D = []
        for w in range(self.W):
            _copy_mnist_g(torch, self.G[w], gp, gbn)
            d = tnn.Sequential(_t_mnist_d(torch, 1), tnn.Sigmoid())
            _copy_seq_d(torch, d[0], dp)
            self.D.append(d)
        self.optG = [torch.optim.Adam(g.parameters(), lr=cfg.lr_g,
                                      betas=(cfg.b1, cfg.b2))
                     for g in self.G]
        self.optD = [torch.optim.Adam(d.parameters(), lr=cfg.lr_d,
                                      betas=(cfg.b1, cfg.b2))
                     for d in self.D]
        self.g_global = {k: v.clone() for k, v in
                         self.G[0].state_dict().items()}
        self.d_global = {k: v.clone() for k, v in
                         self.D[0].state_dict().items()}

    def round(self, t, starts, z1, z2):
        torch, cfg = self.torch, self.cfg
        valid = torch.ones(self.B, 1)
        fake_t = torch.zeros(self.B, 1)
        for w in range(self.W):
            g, d = self.G[w], self.D[w]
            with torch.no_grad():
                g.load_state_dict(self.g_global, strict=False)
                d.load_state_dict(self.d_global, strict=False)
            for i in range(int(self.steps[w])):     # ragged epochs
                st = int(starts[i])
                real = _t_normalize(torch,
                                    self.shards[w, st:st + self.B])
                fake = g(torch.from_numpy(z1[w, i])).detach()
                d_loss = self.bce(d(real), valid) + self.bce(d(fake), fake_t)
                self.optD[w].zero_grad()
                d_loss.backward()
                self.optD[w].step()
                g_loss = self.bce(d(g(torch.from_numpy(z2[w, i]))), valid)
                self.optG[w].zero_grad()
                g_loss.backward()
                self.optG[w].step()
        with torch.no_grad():
            for k_ in self.g_global:
                if self.g_global[k_].dim() == 0:
                    continue            # num_batches_tracked: not averaged
                self.g_global[k_] = torch.stack(
                    [g.state_dict()[k_].float() for g in self.G]).mean(0)
            for k_ in self.d_global:
                if self.d_global[k_].dim() == 0:
                    continue
                self.d_global[k_] = torch.stack(
                    [d.state_dict()[k_].float() for d in self.D]).mean(0)

    def sample(self, zs):
        torch = self.torch
        g = _t_mnist_g(torch)
        g.load_state_dict(self.g_global, strict=False)
        g.eval()
        with torch.no_grad():
            return g(torch.from_numpy(zs.copy())).numpy()


class TorchMDGANTwin:
    """The reference MD-GAN 2DMG protocol in eager torch
    (MDGAN/2DMG/mdgan.py:108-280): central G makes Xd (detached) + Xg;
    every worker trains its own D ``epoch`` steps on (real, Xd); the server
    means the workers' BCE(D_i(Xg), 1) losses through the UPDATED Ds,
    backprops and steps Adam."""

    def __init__(self, cfg, part, jax_state):
        torch = self.torch = _torch()
        import torch.nn as tnn
        self.cfg = cfg
        self.W = cfg.num_workers
        self.B = cfg.batch_size
        self.shards = np.asarray(part.data)
        self.bce = tnn.BCELoss()

        # central G: 2dmg-mlp 100-256-128-2 (MDGAN/2DMG/model.py:5-20);
        # jax state stacks it on a leading servers axis of size 1
        self.G = _t_flgan_g(torch)
        gp = jax_state.g.params
        lins = [m for m in self.G if m.__class__.__name__ == "Linear"]
        for m, p in zip(lins, [x for x in gp
                               if isinstance(x, dict) and "w" in x]):
            _copy_linear(torch, m, {k: np.asarray(v)[0]
                                    for k, v in p.items()})
        self.optG = torch.optim.Adam(self.G.parameters(), lr=cfg.lr_g,
                                     betas=(cfg.b1, cfg.b2))
        dp = jax_state.d.params
        self.D, self.optD = [], []
        for i in range(self.W):
            d = _t_2dmg_d(torch)
            _copy_seq_d(torch, d, [
                None if x is None else
                {k: np.asarray(v)[0, i] for k, v in x.items()} for x in dp])
            self.D.append(d)
            self.optD.append(torch.optim.Adam(
                d.parameters(), lr=cfg.lr_d, betas=(cfg.b1, cfg.b2)))

    def round(self, t, starts, z_d, z_g):
        torch, cfg = self.torch, self.cfg
        valid = torch.ones(self.B, 1)
        fake_t = torch.zeros(self.B, 1)
        xd = self.G(torch.from_numpy(z_d[0])).detach()
        for i in range(self.W):
            d, optd = self.D[i], self.optD[i]
            for e in range(cfg.epoch):
                st = int(starts[e])
                real = torch.from_numpy(self.shards[i, st:st + self.B].copy())
                loss = self.bce(d(real), valid) + self.bce(d(xd), fake_t)
                optd.zero_grad()
                loss.backward()
                optd.step()
        xg = self.G(torch.from_numpy(z_g[0]))
        g_loss = torch.stack(
            [self.bce(self.D[i](xg), valid) for i in range(self.W)]).mean()
        self.optG.zero_grad()
        g_loss.backward()
        self.optG.step()

    def sample(self, zs):
        with self.torch.no_grad():
            return self.G(self.torch.from_numpy(zs[0].copy())).numpy()


class TorchMDGANConvTwin:
    """MD-GAN with the conv LSGAN pair (model/lsgan.py:3-98) on the image
    workload: certifies the conv family's MULTI-ROUND numerics (BN(eps 0.8)
    batch stats + running-stat updates on both G and D, Dropout2d channel
    masks replicated from the jax draw, raw-logit BCE) to the same standard
    as the MLP trajectory twins.  The conv D has BatchNorm, so the G-loss
    forward must NOT advance D running stats (the jitted g_obj discards
    them) — buffers are snapshotted and restored around it."""

    def __init__(self, cfg, part, jax_state):
        torch = self.torch = _torch()
        import torch.nn as tnn

        from benchmarks.torch_conv_twins import TorchConvD, TorchConvG
        from cglgan_tpu.core import prng

        self.cfg = cfg
        self.W = cfg.num_workers
        self.B = cfg.batch_size
        self.shards = np.asarray(part.data)
        self.bcel = tnn.BCEWithLogitsLoss()
        self.root = prng.root_key(cfg.seed)

        take0 = lambda tree: {k: np.asarray(v)[0] if not isinstance(v, dict)
                              else {kk: np.asarray(vv)[0]
                                    for kk, vv in v.items()}
                              for k, v in tree.items()}
        self.G = TorchConvG()
        self.G.load_jax(take0(jax_state.g.params), take0(jax_state.g.bn))
        self.optG = torch.optim.Adam(self.G.parameters(), lr=cfg.lr_g,
                                     betas=(cfg.b1, cfg.b2))
        self.D, self.optD = [], []
        for i in range(self.W):
            takei = lambda tree: {
                k: np.asarray(v)[0, i] if not isinstance(v, dict)
                else {kk: np.asarray(vv)[0, i] for kk, vv in v.items()}
                for k, v in tree.items()}
            d = TorchConvD()
            d.load_jax(takei(jax_state.d.params), takei(jax_state.d.bn))
            self.D.append(d)
            self.optD.append(torch.optim.Adam(
                d.parameters(), lr=cfg.lr_d, betas=(cfg.b1, cfg.b2)))

    def _real(self, i, st):
        x = self.shards[i, st:st + self.B].astype(np.float32) / 255.0
        x = (x - 0.5) / 0.5
        side = int(round(x.shape[1] ** 0.5))
        return self.torch.from_numpy(x.reshape(self.B, 1, side, side))

    def round(self, t, starts, z_d, z_g):
        import jax

        from benchmarks.torch_conv_twins import dropout_masks
        from cglgan_tpu.core import prng

        torch, cfg = self.torch, self.cfg
        # replicate the round's dropout key fan-out
        # (mdgan_family.round_fn / server_round)
        key = prng.for_round(prng.for_role(self.root, prng.ROLE_LOCAL), t)
        (key0,) = jax.random.split(key, 1)
        _k_zd, _k_zg, k_d, k_drop = jax.random.split(key0, 4)
        d_keys = jax.random.split(k_d, self.W)
        drop_keys = jax.random.split(k_drop, self.W)

        ones = torch.ones(self.B, 1)
        zeros = torch.zeros(self.B, 1)
        with torch.no_grad():       # Xd: train-mode fwd advances G BN stats
            xd = self.G(torch.from_numpy(z_d[0]))
        st = int(starts[0])         # epoch == 1 (d_epoch_steps single path)
        for i in range(self.W):
            d, optd = self.D[i], self.optD[i]
            r1, r2 = jax.random.split(d_keys[i])   # common.d_step_fn
            loss = (self.bcel(d(self._real(i, st),
                                dropout_masks(r1, self.B)), ones)
                    + self.bcel(d(xd, dropout_masks(r2, self.B)), zeros))
            optd.zero_grad()
            loss.backward()
            optd.step()
        xg = self.G(torch.from_numpy(z_g[0]))
        # the jitted g_obj discards the D BN state of this forward — restore
        # the buffers afterwards (after backward: torch's train-mode BN op
        # mutates them in-place and autograd version-checks them)
        snaps = [{k: v.clone() for k, v in d.state_dict().items()
                  if "running_" in k or "num_batches" in k}
                 for d in self.D]
        graph = [self.bcel(self.D[i](xg, dropout_masks(drop_keys[i],
                                                       self.B)), ones)
                 for i in range(self.W)]
        g_loss = torch.stack(graph).mean()
        self.optG.zero_grad()
        g_loss.backward()
        self.optG.step()
        with torch.no_grad():
            for d, snap in zip(self.D, snaps):
                d.load_state_dict(snap, strict=False)

    def sample(self, zs):
        torch = self.torch
        with torch.no_grad():
            self.G.eval()
            out = self.G(torch.from_numpy(zs[0].copy())).numpy()
            self.G.train()
        return out


class TorchCGLConvTwin(TorchCGLTwin):
    """The multipath conv CGL-GAN — the archived conv flagship
    (results/runs/mnist-iid1-cglgan-conv) — as an eager-torch protocol twin:
    conv Mix-G head routing (model/lsgan.py:34-71 fixed per zoo.py) + the
    cgl_mean_game Lambda weighting + conv Ds with BN(eps 0.8)/Dropout2d,
    trunk-scope cloud sync incl. BN buffers.  Composes the pieces the MLP
    CGL twin and the MD-GAN conv twin certify separately; the freeze dance,
    game math (inherited ``_game``) and BN/dropout replication follow those
    twins exactly."""

    def __init__(self, cfg, part, jax_state):
        torch = self.torch = _torch()
        import jax
        import torch.nn as tnn

        from benchmarks.torch_conv_twins import TorchConvD, TorchConvMixG
        from cglgan_tpu.core import prng
        from cglgan_tpu.fed import topology

        self.cfg = cfg
        S, self.k = cfg.num_servers, cfg.clients_per_server
        self.S, k = S, self.k
        self.B = cfg.batch_size
        self.shards = np.asarray(part.data).reshape(
            (S, k) + part.data.shape[1:])
        self.beta = topology.server_beta(part.lengths, S)        # (S, k)
        dl = topology.server_data_len(part.lengths, S)
        self.a_w = (dl / dl.sum()).astype(np.float32)            # (S,)
        self.lam = np.zeros(S, np.float32)
        self.bcel = tnn.BCEWithLogitsLoss()   # conv D: raw logits
        self.root = prng.root_key(cfg.seed)

        gp, gs = jax_state.g.params, jax_state.g.bn
        dp, ds = jax_state.d.params, jax_state.d.bn
        self.G, self.optG, self.D, self.optD = [], [], [], []
        for s in range(S):
            g = TorchConvMixG(k)
            g.load_jax(jax.tree.map(lambda x: np.asarray(x)[s], gp),
                       jax.tree.map(lambda x: np.asarray(x)[s], gs))
            self.G.append(g)
            self.optG.append(torch.optim.Adam(
                g.parameters(), lr=cfg.lr_g, betas=(cfg.b1, cfg.b2)))
            ds_row, opt_row = [], []
            for i in range(k):
                d = TorchConvD()
                d.load_jax(jax.tree.map(lambda x: np.asarray(x)[s, i], dp),
                           jax.tree.map(lambda x: np.asarray(x)[s, i], ds))
                ds_row.append(d)
                opt_row.append(torch.optim.Adam(
                    d.parameters(), lr=cfg.lr_d, betas=(cfg.b1, cfg.b2)))
            self.D.append(ds_row)
            self.optD.append(opt_row)

    def _real(self, s, i, st):
        x = self.shards[s, i, st:st + self.B].astype(np.float32) / 255.0
        x = (x - 0.5) / 0.5
        side = int(round(x.shape[1] ** 0.5))
        return self.torch.from_numpy(x.reshape(self.B, 1, side, side))

    def _cloud_sync(self, t):
        """Trunk-scope weighted average + sigma-mix on the countdown cadence,
        moving params AND BN buffers (sync_bn: cglgan syncs via
        copy_parameters, CGLGAN/MNIST/main.py:140-145,177-184)."""
        cfg, torch = self.cfg, self.torch
        if cfg.cloud_epoch <= 0 or \
                (cfg.num_communication - t) % max(cfg.cloud_epoch, 1) != 0:
            return
        with torch.no_grad():
            rows = [g.trunk_tensors() for g in self.G]
            for j in range(len(rows[0])):
                avg = sum(float(self.a_w[s]) * rows[s][j]
                          for s in range(self.S))
                for s in range(self.S):
                    rows[s][j].copy_(cfg.segema * rows[s][j]
                                     + (1 - cfg.segema) * avg)

    def round(self, t, starts, z_d, z_g):
        import jax

        from benchmarks.torch_conv_twins import dropout_masks
        from cglgan_tpu.core import prng

        torch, k = self.torch, self.k
        self._cloud_sync(t)
        # replicate the round's key fan-out (cgl_family.round_fn/server_round)
        key = prng.for_round(prng.for_role(self.root, prng.ROLE_LOCAL), t)
        keys = jax.random.split(key, self.S)
        ones = torch.ones(self.B, 1)
        zeros = torch.zeros(self.B, 1)
        st = int(starts[0])         # epoch == 1 (d_epoch_steps single path)
        for s in range(self.S):
            _zd, _zg, k_d, k_drop = jax.random.split(keys[s], 4)
            d_keys = jax.random.split(k_d, k)
            drop_keys = jax.random.split(k_drop, k)
            g, optg = self.G[s], self.optG[s]
            with torch.no_grad():   # Xd: train-mode fwd advances G BN stats
                xd = g(torch.from_numpy(z_d[s]))      # (k, B, 1, 32, 32)
            for i in range(k):
                d, optd = self.D[s][i], self.optD[s][i]
                r1, r2 = jax.random.split(d_keys[i])   # common.d_step_fn
                loss = (self.bcel(d(self._real(s, i, st),
                                    dropout_masks(r1, self.B)), ones)
                        + self.bcel(d(xd[i], dropout_masks(r2, self.B)),
                                    zeros))
                optd.zero_grad()
                loss.backward()
                optd.step()
            xg = g(torch.from_numpy(z_g[s]))
            # the jitted per_client_losses discards D BN state — snapshot
            # and restore after backward (train-mode BN mutates in place)
            snaps = [{k_: v.clone() for k_, v in d.state_dict().items()
                      if "running_" in k_ or "num_batches" in k_}
                     for d in self.D[s]]
            graph = [self.bcel(self.D[s][i](xg[i],
                                            dropout_masks(drop_keys[i],
                                                          self.B)), ones)
                     for i in range(k)]
            l = torch.stack(graph).detach()
            w = self._game(s, l)
            optg.zero_grad()
            # heads <- sum(l) trunk frozen; trunk <- sum(w*l) heads frozen
            g.set_trunk_grad(False)
            sum(graph).backward(retain_graph=True)
            g.set_trunk_grad(True)
            g.set_heads_grad(False)
            (w * torch.stack(graph)).sum().backward()
            g.set_heads_grad(True)
            optg.step()
            with torch.no_grad():
                for d, snap in zip(self.D[s], snaps):
                    d.load_state_dict(snap, strict=False)

    def sample(self, zs):
        torch, k = self.torch, self.k
        outs = []
        with torch.no_grad():
            for s in range(self.S):
                self.G[s].eval()
                out = self.G[s](torch.from_numpy(zs[s].copy()))
                per = out.shape[1]
                outs.append(out.reshape((k * per,)
                                        + out.shape[2:])[::k].numpy())
                self.G[s].train()
        return np.concatenate(outs, axis=0)


class TorchFLGANTwin:
    """The reference FL-GAN 2DMG protocol in eager torch
    (FLGAN/2DMG/flgan.py:107-258): broadcast -> local D/G sweeps with
    persistent per-worker Adam state -> uniform FedAvg."""

    def __init__(self, cfg, part, jax_state):
        torch = self.torch = _torch()
        import torch.nn as tnn
        self.cfg = cfg
        self.W = cfg.num_workers
        self.B = cfg.batch_size
        self.shards = np.asarray(part.data)
        self.bce = tnn.BCELoss()

        self.G = [_t_flgan_g(torch) for _ in range(self.W)]
        self.D = [_t_2dmg_d(torch) for _ in range(self.W)]
        gp, dp = jax_state.g.params, jax_state.d.params
        for w in range(self.W):
            lins = [m for m in self.G[w]
                    if m.__class__.__name__ == "Linear"]
            for m, p in zip(lins, [x for x in gp
                                   if isinstance(x, dict) and "w" in x]):
                _copy_linear(torch, m, p)
            _copy_seq_d(torch, self.D[w], dp)
        self.optG = [torch.optim.Adam(g.parameters(), lr=cfg.lr_g,
                                      betas=(cfg.b1, cfg.b2))
                     for g in self.G]
        self.optD = [torch.optim.Adam(d.parameters(), lr=cfg.lr_d,
                                      betas=(cfg.b1, cfg.b2))
                     for d in self.D]
        # the server copy (broadcast source)
        self.g_global = {k: v.clone() for k, v in
                         self.G[0].state_dict().items()}
        self.d_global = {k: v.clone() for k, v in
                         self.D[0].state_dict().items()}

    def round(self, t, starts, z1, z2):
        torch, cfg = self.torch, self.cfg
        valid = torch.ones(self.B, 1)
        fake_t = torch.zeros(self.B, 1)
        for w in range(self.W):
            g, d = self.G[w], self.D[w]
            # broadcast: load global params, keep local Adam moments
            with torch.no_grad():
                g.load_state_dict(self.g_global)
                d.load_state_dict(self.d_global)
            for i in range(cfg.epoch):
                st = int(starts[i])
                real = torch.from_numpy(self.shards[w, st:st + self.B].copy())
                fake = g(torch.from_numpy(z1[w, i])).detach()
                d_loss = self.bce(d(real), valid) + self.bce(d(fake), fake_t)
                self.optD[w].zero_grad()
                d_loss.backward()
                self.optD[w].step()
                g_loss = self.bce(d(g(torch.from_numpy(z2[w, i]))), valid)
                self.optG[w].zero_grad()
                g_loss.backward()
                self.optG[w].step()
        # uniform FedAvg of params (FLGAN/MNIST/flgan.py:148-162)
        with torch.no_grad():
            for k_ in self.g_global:
                self.g_global[k_] = torch.stack(
                    [g.state_dict()[k_] for g in self.G]).mean(0)
            for k_ in self.d_global:
                self.d_global[k_] = torch.stack(
                    [d.state_dict()[k_] for d in self.D]).mean(0)

    def sample(self, zs):
        torch = self.torch
        g = _t_flgan_g(torch)
        g.load_state_dict(self.g_global)
        with torch.no_grad():
            return g(torch.from_numpy(zs.copy())).numpy()


class TorchFeGANTwin:
    """The reference FeGAN protocol in eager torch (fegan.py:95-303):
    balanced group schedule, exp(KL-score) aggregation weights, broadcast ->
    local sweeps with persistent per-worker Adam state -> score-weighted
    FedAvg of the sampled group only.  Consumes the SAME host-side schedule
    and sk scores the jax runner derives from the partition."""

    def __init__(self, cfg, part, jax_state, schedule, sk):
        torch = self.torch = _torch()
        import torch.nn as tnn
        self.cfg = cfg
        self.W = cfg.num_workers
        self.B = cfg.batch_size
        self.shards = np.asarray(part.data)
        self.schedule = np.asarray(schedule)
        self.sk = np.asarray(sk, np.float32)
        self.bce = tnn.BCELoss()

        self.G = [_t_small_g(torch) for _ in range(self.W)]
        self.D = [_t_2dmg_d(torch) for _ in range(self.W)]
        gp, dp = jax_state.g.params, jax_state.d.params
        for w in range(self.W):
            lins = [m for m in self.G[w]
                    if m.__class__.__name__ == "Linear"]
            for m, p in zip(lins, [x for x in gp
                                   if isinstance(x, dict) and "w" in x]):
                _copy_linear(torch, m, p)
            _copy_seq_d(torch, self.D[w], dp)
        self.optG = [torch.optim.Adam(g.parameters(), lr=cfg.lr_g,
                                      betas=(cfg.b1, cfg.b2))
                     for g in self.G]
        self.optD = [torch.optim.Adam(d.parameters(), lr=cfg.lr_d,
                                      betas=(cfg.b1, cfg.b2))
                     for d in self.D]
        self.g_global = {k: v.clone() for k, v in
                         self.G[0].state_dict().items()}
        self.d_global = {k: v.clone() for k, v in
                         self.D[0].state_dict().items()}

    def round(self, t, starts, z1, z2):
        torch, cfg = self.torch, self.cfg
        group = self.schedule[t]
        mask = np.zeros(self.W, np.float32)
        mask[group] = 1.0
        wts = np.exp(self.sk) * mask
        wts = wts / max(wts.sum(), 1e-12)
        valid = torch.ones(self.B, 1)
        fake_t = torch.zeros(self.B, 1)
        for w in np.unique(group):
            g, d = self.G[w], self.D[w]
            with torch.no_grad():
                g.load_state_dict(self.g_global)
                d.load_state_dict(self.d_global)
            for i in range(cfg.epoch):
                st = int(starts[i])
                real = torch.from_numpy(self.shards[w, st:st + self.B].copy())
                fake = g(torch.from_numpy(z1[w, i])).detach()
                d_loss = self.bce(d(real), valid) + self.bce(d(fake), fake_t)
                self.optD[w].zero_grad()
                d_loss.backward()
                self.optD[w].step()
                g_loss = self.bce(d(g(torch.from_numpy(z2[w, i]))), valid)
                self.optG[w].zero_grad()
                g_loss.backward()
                self.optG[w].step()
        with torch.no_grad():
            for k_ in self.g_global:
                self.g_global[k_] = sum(
                    float(wts[w]) * self.G[w].state_dict()[k_]
                    for w in range(self.W) if wts[w] > 0)
            for k_ in self.d_global:
                self.d_global[k_] = sum(
                    float(wts[w]) * self.D[w].state_dict()[k_]
                    for w in range(self.W) if wts[w] > 0)

    def sample(self, zs):
        torch = self.torch
        g = _t_small_g(torch)
        g.load_state_dict(self.g_global)
        with torch.no_grad():
            return g(torch.from_numpy(zs.copy())).numpy()


# ---------------------------------------------------------------------------
# the comparison harness
# ---------------------------------------------------------------------------

def _shrink_partition(part, cap: int):
    """Clip every worker's shard to at most ``cap`` true rows (wrap-padded
    to the new common max, like partition() itself).  Keeps the image
    workloads' ragged "epochs" sweep testable at parity-harness scale —
    BOTH implementations consume the same shrunk partition, so the
    comparison stays exact."""
    from cglgan_tpu.data.partition import Partition
    W = part.num_workers
    new_len = np.minimum(part.lengths, cap)
    m = int(new_len.max())
    data = np.stack([np.resize(part.data[w, :new_len[w]],
                               (m,) + part.data.shape[2:])
                     for w in range(W)])
    labels = np.stack([np.resize(part.labels[w, :new_len[w]], (m,))
                       for w in range(W)])
    return Partition(data, labels, new_len.astype(part.lengths.dtype),
                     part.class_freq, part.eval_pool)


def run_compare(algo: str, rounds: int, tick: int, shrink_to: int = None,
                **cfg_kw):
    """Run both implementations for ``rounds`` rounds and return the list of
    per-tick dicts {round, kl_jax, ds_jax, kl_torch, ds_torch}."""
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from cglgan_tpu.algos.registry import build_runner, load_partition
    from cglgan_tpu.core import prng
    from cglgan_tpu.core.config import FedGANConfig
    from cglgan_tpu.evalx.hist2d import kl_and_distribution_score

    base = dict(dataset="2dmg", num_class=4, num_sample=256, batch_size=32,
                iid=1, epoch=1)
    base.update(cfg_kw)
    cfg = FedGANConfig(algo=algo, num_communication=rounds, **base)
    part = load_partition(cfg)
    if shrink_to is not None:
        part = _shrink_partition(part, shrink_to)
    runner = build_runner(cfg, part)
    state = runner.init_state()
    root = prng.root_key(cfg.seed)
    max_len = part.data.shape[1]

    if algo == "cglgan":
        twin = (TorchCGLConvTwin if cfg.conv
                else TorchCGLTwin)(cfg, part, state)
        streams = cgl_round_streams(root, cfg, max_len)
    elif algo == "mixgan":
        twin = TorchMixGANTwin(cfg, part, state)
        streams = cgl_round_streams(root, cfg, max_len)
    elif algo == "capgan":
        twin = (TorchCAPGANMNISTTwin if cfg.is_image
                else TorchCAPGANTwin)(cfg, part, state)
        streams = cgl_round_streams(root, cfg, max_len)
    elif algo == "mdgan":
        # same per-round draw sequence as the CGL family (S=1)
        twin = (TorchMDGANConvTwin if cfg.conv
                else TorchMDGANTwin)(cfg, part, state)
        streams = cgl_round_streams(root, cfg, max_len)
    elif algo == "acgan":
        # multi-server variant of the same draw sequence
        twin = TorchACGANTwin(cfg, part, state)
        streams = cgl_round_streams(root, cfg, max_len)
    elif algo == "flgan":
        if cfg.is_image:
            from cglgan_tpu.algos.fedavg_family import _local_steps
            wsteps = _local_steps(cfg, part.lengths)
            twin = TorchFLGANMNISTTwin(cfg, part, state, wsteps)
            streams = flgan_round_streams(root, cfg, max_len,
                                          max_steps=int(wsteps.max()))
        else:
            twin = TorchFLGANTwin(cfg, part, state)
            streams = flgan_round_streams(root, cfg, max_len)
    elif algo == "fegan":
        twin = TorchFeGANTwin(cfg, part, state, runner.extras["schedule"],
                              runner.extras["sk"])
        streams = flgan_round_streams(root, cfg, max_len)
    else:
        raise ValueError(algo)

    zs = eval_z(root, cfg)
    round_jit = jax.jit(runner.round_fn)
    if not cfg.is_image:
        pool = jnp.asarray(part.eval_pool)
        bins = 32 if algo == "mdgan" else 16   # production eval bin counts

    out = []
    for t in range(rounds):
        st, a, b = streams(t)
        twin.round(t, st, a, b)
        state, _ = round_jit(state)
        if (t + 1) % tick == 0:
            s_j = runner.sample(state, cfg.num_sample)
            s_t = twin.sample(zs)
            if cfg.is_image:
                # image workload: compare the generated images directly
                # (generator output in [-1,1]); KL/DS are 2DMG metrics
                a_j = np.asarray(s_j).reshape(len(s_t), -1)
                b_t = np.asarray(s_t).reshape(len(s_t), -1)
                out.append({"round": t + 1,
                            "samples_rmse": float(np.sqrt(np.mean(
                                (a_j - b_t) ** 2))),
                            "samples_maxdiff": float(
                                np.abs(a_j - b_t).max())})
                continue
            kl_j, ds_j = kl_and_distribution_score(s_j, pool, bins)
            kl_t, ds_t = kl_and_distribution_score(jnp.asarray(s_t), pool,
                                                   bins)
            out.append({"round": t + 1,
                        "kl_jax": float(kl_j), "ds_jax": float(ds_j),
                        "kl_torch": float(kl_t), "ds_torch": float(ds_t),
                        "samples_rmse": float(np.sqrt(np.mean(
                            (np.asarray(s_j) - s_t) ** 2)))})
    return out


def main():
    for algo, rounds, tick in (("cglgan", 400, 50), ("flgan", 400, 50),
                               ("mdgan", 400, 50), ("fegan", 400, 50),
                               ("capgan", 400, 50), ("mixgan", 400, 50),
                               ("acgan", 400, 50)):
        print(f"== {algo}: {rounds} rounds, tick {tick} ==")
        kw = {"num_workers": 4}
        if algo == "cglgan":
            kw.update(num_servers=2, cloud_epoch=2)
        if algo == "mixgan":
            kw.update(num_servers=2, cloud_epoch=2)
        if algo == "capgan":
            kw.update(num_servers=2, cloud_epoch=1)
        if algo == "acgan":
            kw.update(num_servers=2)
        if algo == "fegan":
            kw.update(frac_workers=0.5)
        for row in run_compare(algo, rounds, tick, **kw):
            print("  " + " ".join(f"{k}={v:.4f}" if isinstance(v, float)
                                  else f"{k}={v}" for k, v in row.items()))


if __name__ == "__main__":
    main()
