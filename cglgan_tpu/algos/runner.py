"""Runner: the uniform contract every algorithm implements, plus the
scan-based training loop.

The reference's training loop is (S + W + 1) Python threads blocking on
queues for 10-20k rounds (CGLGAN/MNIST/main.py:517-532).  Here a *round* is
one pure jitted function ``round_fn(state) -> (state, metrics)`` and the loop
is ``jax.lax.scan`` over ``num_plt`` rounds per eval tick — one device
dispatch per tick instead of thousands of host round-trips per second.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp

from cglgan_tpu.core.config import FedGANConfig
from cglgan_tpu.data.partition import Partition


class Runner(NamedTuple):
    cfg: FedGANConfig
    part: Partition
    init_state: Callable[[], Any]                    # () -> FedState
    round_fn: Callable[[Any], Any]                   # state -> (state, metrics)
    sample: Callable[[Any, int], jax.Array]          # (state, n) -> samples
    extras: Optional[Dict[str, Any]] = None
    # (state, z[n, latent_dim]) -> samples[n]: the serving contract — the
    # same eval-mode generator + painter routing as `sample`, but with
    # caller-supplied latents (the basis of `tpufed export`, utils/export.py)
    gen: Optional[Callable[[Any, jax.Array], jax.Array]] = None
    # serving batch constraint: n must be a multiple of this (the
    # per-server quota families set it to num_servers; 1 = any batch)
    gen_batch_multiple: int = 1
    # (state, z[n, latent_dim], client:int static) -> samples[n]: client
    # c's PERSONALIZED generator — the multi-path G's whole point is
    # per-client heads (mixed-gan.py:242-252 routes head i to client i);
    # CGL-family only (head c%k of server c//k's G; the server's G for the
    # single-path CAP-GAN).  None for the non-hierarchical families.
    gen_client: Optional[Callable[[Any, jax.Array, int], jax.Array]] = None


def scan_rounds(round_fn, n: int, unroll: int = 1, donate: bool = False):
    """Fuse ``n`` rounds into one compiled scan; metrics are averaged on
    device so only scalars cross back to the host.  ``unroll`` is exposed
    for benchmarking only — measured slower at every k>1 (PERF.md).

    ``donate``: donate the carry's input buffers to the output (the chunk
    runner rebinds ``state = run(state)``, so the input is dead at the call
    site).  The caller's input state is INVALID afterwards — callers that
    keep the pre-chunk state must copy it first.  Measured SLOWER on both
    the unsharded and the GSPMD mesh path (0.86x / 0.88x — PERF.md round-4
    mesh entry; XLA's non-aliased schedule wins and donation does not
    touch the tunnel transfer), so it stays default-off and exists for
    benchmarking, like ``unroll``."""
    def body(state, _):
        state, m = round_fn(state)
        return state, m

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def run(state):
        state, ms = jax.lax.scan(body, state, None, length=n, unroll=unroll)
        return state, jax.tree.map(lambda x: jnp.mean(x, axis=0), ms)

    return run


def train(runner: Runner,
          rounds: Optional[int] = None,
          eval_every: Optional[int] = None,
          eval_n: Optional[int] = None,
          on_tick: Optional[Callable[..., None]] = None,
          state=None,
          evaluator: Optional[Callable] = None) -> Dict[str, Any]:
    """Run training with periodic evaluation.

    Returns {"state": final_state, "history": [tick dicts]}.  Each tick dict
    carries the averaged round metrics over the chunk plus the workload's
    eval metrics — KL/DS/coverage for 2DMG, FID/IS for image configs — from
    ``evalx.evaluator.make_evaluator`` (reference painter cadence, num_plt
    rounds — CGLGAN/2DMG/main.py:73, FLGAN/MNIST/flgan.py:62-104).  Pass
    ``evaluator=False`` to skip workload evaluation, or a custom callable
    ``(runner, state) -> dict``.  ``on_tick`` is called as
    ``on_tick(round, tick, state)``; ``tick["round"]`` is the ABSOLUTE round
    counter (resume-aware).
    """
    cfg = runner.cfg
    rounds = rounds if rounds is not None else cfg.num_communication
    eval_every = eval_every if eval_every is not None else cfg.num_plt
    eval_every = max(1, min(eval_every, rounds))

    if state is None:
        state = runner.init_state()
    if evaluator is None:
        from cglgan_tpu.evalx.evaluator import make_evaluator
        evaluator = make_evaluator(cfg, runner.part, eval_n=eval_n)

    # Scan piece size: fuse at most `piece` rounds into one device program.
    # One program per eval interval is fastest, but a single XLA execution
    # must stay bounded in wall time — the heavy ragged-epochs local sweeps
    # (~115 interleaved D/G steps per round on the reference MNIST shards)
    # at num_plt=2000 produced a ~7-minute program that crashed the TPU
    # worker.  Auto (scan_rounds=0) budgets ~10k local steps per program
    # (tens of seconds at worst); scan_rounds>0 overrides explicitly.
    if cfg.scan_rounds and cfg.scan_rounds > 0:
        piece = cfg.scan_rounds
    else:
        if cfg.resolved_local_sweep == "epochs":
            steps = max(1, cfg.epoch) * -(-runner.part.data.shape[1]
                                          // cfg.batch_size)
        else:
            steps = max(1, cfg.epoch)
        piece = max(1, min(eval_every, 10000 // steps))

    chunks: Dict[int, Callable] = {}

    def run_chunk(n: int):
        if n not in chunks:
            chunks[n] = scan_rounds(runner.round_fn, n)
        return chunks[n]

    history: List[Dict] = []
    t0 = time.perf_counter()
    done = 0
    while done < rounds:
        interval = min(eval_every, rounds - done)   # never overshoot
        left, acc = interval, None
        while left > 0:
            n = min(piece, left)
            state, m = run_chunk(n)(state)
            # weight each piece's on-device mean by its length; scalars
            # only cross to the host once per tick
            acc = jax.tree.map(lambda x: x * n, m) if acc is None else \
                jax.tree.map(lambda a, x: a + x * n, acc, m)
            left -= n
        metrics = jax.tree.map(lambda a: a / interval, acc)
        done += interval
        tick: Dict[str, Any] = {k: float(v) for k, v in metrics.items()}
        tick["round"] = int(state.t) if hasattr(state, "t") else done
        if evaluator:
            tick.update(evaluator(runner, state))
        tick["wall_s"] = time.perf_counter() - t0
        tick["rounds_per_s"] = done / tick["wall_s"]
        history.append(tick)
        if on_tick is not None:
            on_tick(tick["round"], tick, state)
    return {"state": state, "history": history}
