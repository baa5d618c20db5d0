"""Reference-style CAP-GAN round benchmark (torch CPU, threads + queues).

A miniature re-creation of the reference's execution architecture — one
Python thread per federated node exchanging tensors over ``queue.Queue``
(capgan.py:120-349) — used ONLY to self-measure the baseline rounds/sec that
``bench.py`` compares against (BASELINE.md: the reference publishes no
numbers, so the baseline must be self-measured).  Fresh code, not a copy:
same protocol shape (server makes Xd/Xg -> workers D-step + G-loss ->
server aggregates + Adam), same model sizes, same batch size.
"""
from __future__ import annotations

import queue
import threading
import time

import torch
from torch import nn, optim


def make_g():
    return nn.Sequential(
        nn.Linear(100, 128), nn.LeakyReLU(0.2),
        nn.Linear(128, 256), nn.BatchNorm1d(256, 0.8), nn.LeakyReLU(0.2),
        nn.Linear(256, 512), nn.BatchNorm1d(512, 0.8), nn.LeakyReLU(0.2),
        nn.Linear(512, 1024), nn.BatchNorm1d(1024, 0.8), nn.LeakyReLU(0.2),
        nn.Linear(1024, 784), nn.Tanh())


def make_d():
    return nn.Sequential(
        nn.Linear(784, 512), nn.LeakyReLU(0.2),
        nn.Linear(512, 256), nn.LeakyReLU(0.2),
        nn.Linear(256, 2))


def measure_rounds_per_sec(num_workers: int = 16, batch: int = 100,
                           rounds: int = 20, epoch: int = 1) -> float:
    torch.manual_seed(0)
    torch.set_num_threads(1)   # the image has one core anyway
    ce = nn.CrossEntropyLoss()

    to_workers = [queue.Queue(maxsize=4) for _ in range(num_workers)]
    to_server = queue.Queue(maxsize=4 * num_workers)
    real_data = [torch.randn(512, 784) for _ in range(num_workers)]

    def worker_loop(i):
        d = make_d()
        opt = optim.Adam(d.parameters(), lr=2e-4, betas=(0.5, 0.999))
        ones = torch.ones(batch, dtype=torch.long)
        zeros = torch.zeros(batch, dtype=torch.long)
        while True:
            msg = to_workers[i].get()
            if msg is None:
                return
            xd, xg = msg
            for _ in range(epoch):
                idx = torch.randint(0, real_data[i].shape[0], (batch,))
                real = real_data[i][idx]
                opt.zero_grad()
                loss = (ce(d(real), ones) + ce(d(xd), zeros)) * 0.5
                loss.backward()
                opt.step()
            g_loss = ce(d(xg), ones)
            to_server.put((i, g_loss))

    threads = [threading.Thread(target=worker_loop, args=(i,), daemon=True)
               for i in range(num_workers)]
    for th in threads:
        th.start()

    g = make_g()
    opt_g = optim.Adam(g.parameters(), lr=2e-4, betas=(0.5, 0.999))
    beta = torch.full((num_workers,), 1.0 / num_workers)

    def one_round():
        with torch.no_grad():
            xd = g(torch.randn(batch, 100))
        xg = g(torch.randn(batch, 100))
        for i in range(num_workers):
            to_workers[i].put((xd.detach(), xg))
        losses = torch.zeros(num_workers)
        graph_losses = []
        for _ in range(num_workers):
            i, gl = to_server.get()
            losses[i] = gl.detach()
            graph_losses.append(gl)
        alpha = torch.softmax(torch.softmax(0.0 * losses, 0) * beta, 0)
        opt_g.zero_grad()
        f = sum(a * gl for a, gl in zip(alpha, graph_losses))
        f.backward(retain_graph=False)
        opt_g.step()

    one_round()  # warmup
    t0 = time.perf_counter()
    for _ in range(rounds):
        one_round()
    dt = time.perf_counter() - t0
    for i in range(num_workers):
        to_workers[i].put(None)
    return rounds / dt


if __name__ == "__main__":
    rps = measure_rounds_per_sec()
    print(f"torch-cpu reference-style CAP-GAN: {rps:.3f} rounds/sec")
