"""Checkpoint / resume via Orbax.

The reference is save-only — ``torch.save(state_dict)`` + pickled metric
histories at the end and every 5000 rounds (capgan.py:185-194,
fegan.py:172-177); **no load path exists anywhere** (SURVEY.md §5).  Here a
checkpoint is the full FedState pytree (params, BN buffers, optimizer state,
Lambda, round counter), so a run resumes bit-exactly.
"""
from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: Any) -> None:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore_checkpoint(path: str, template: Any) -> Any:
    """``template``: a FedState with the right structure/shapes (e.g. from
    ``runner.init_state()``)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)
