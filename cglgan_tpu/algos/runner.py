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
from typing import Any, Callable, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp

from cglgan_tpu.core.config import FedGANConfig
from cglgan_tpu.data.partition import Partition
from cglgan_tpu.evalx.hist2d import kl_and_distribution_score, mode_coverage


class Runner(NamedTuple):
    cfg: FedGANConfig
    part: Partition
    init_state: Callable[[], Any]                    # () -> FedState
    round_fn: Callable[[Any], Any]                   # state -> (state, metrics)
    sample: Callable[[Any, int], jax.Array]          # (state, n) -> samples
    extras: Optional[Dict[str, Any]] = None


def scan_rounds(round_fn, n: int):
    """Fuse ``n`` rounds into one compiled scan; metrics are averaged on
    device so only scalars cross back to the host."""
    def body(state, _):
        state, m = round_fn(state)
        return state, m

    @jax.jit
    def run(state):
        state, ms = jax.lax.scan(body, state, None, length=n)
        return state, jax.tree.map(lambda x: jnp.mean(x, axis=0), ms)

    return run


def train(runner: Runner,
          rounds: Optional[int] = None,
          eval_every: Optional[int] = None,
          eval_n: Optional[int] = None,
          on_tick: Optional[Callable[[int, Dict], None]] = None,
          state=None) -> Dict[str, Any]:
    """Run training with periodic evaluation.

    Returns {"state": final_state, "history": [tick dicts]}.  Each tick dict
    carries the averaged round metrics over the chunk plus (for 2DMG) the
    KL Score / Distribution Score of ``eval_n`` fresh samples against the
    partition's eval pool (reference painter cadence, num_plt rounds —
    CGLGAN/2DMG/main.py:73).
    """
    cfg = runner.cfg
    rounds = rounds if rounds is not None else cfg.num_communication
    eval_every = eval_every if eval_every is not None else cfg.num_plt
    eval_every = max(1, min(eval_every, rounds))
    eval_n = eval_n if eval_n is not None else cfg.num_sample

    if state is None:
        state = runner.init_state()
    chunk = scan_rounds(runner.round_fn, eval_every)
    chunk_n = eval_every

    real_pool = None
    if not cfg.is_image:
        real_pool = jnp.asarray(runner.part.eval_pool)

    history: List[Dict] = []
    t0 = time.perf_counter()
    done = 0
    while done < rounds:
        n = min(eval_every, rounds - done)   # never overshoot `rounds`
        if n != chunk_n:
            chunk = scan_rounds(runner.round_fn, n)
            chunk_n = n
        state, metrics = chunk(state)
        done += n
        tick: Dict[str, Any] = {k: float(v) for k, v in metrics.items()}
        tick["round"] = done
        if real_pool is not None:
            samples = runner.sample(state, eval_n)
            kl, ds = kl_and_distribution_score(samples, real_pool)
            cov = mode_coverage(samples, real_pool)
            tick["kl_score"] = float(kl)
            tick["distribution_score"] = float(ds)
            tick["mode_coverage"] = float(cov)
        tick["wall_s"] = time.perf_counter() - t0
        tick["rounds_per_s"] = done / tick["wall_s"]
        history.append(tick)
        if on_tick is not None:
            on_tick(done, tick)
    return {"state": state, "history": history}
