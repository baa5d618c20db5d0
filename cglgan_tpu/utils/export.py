"""Serving export: package a trained generator as a portable StableHLO
artifact (`jax.export`).

The reference has no deployment story — inference means re-importing the
training script and loading a ``.pt`` state dict into the same class
(`FLGAN/MNIST/flgan.py:233-235` saves; nothing ever loads).  Here the
trained generator becomes a **self-contained compiled artifact**: the
eval-mode generator forward with the checkpoint's weights baked in as
constants, serialized as versioned StableHLO bytes.  A consumer needs jax
(any backend the artifact was lowered for — export cross-lowers for TPU
and CPU from either host) and this file's ``load_generator``; no model
code, no config, no checkpoint tree.

Contract: the exported function maps caller-supplied latents
``z: float32[n, latent_dim]`` to eval-mode samples, with the painter's
per-server routing baked in (multi-path heads strided to the per-server
quota, capgan.py:79-83).  ``n`` is fixed at export time (serving batch);
callers bring their own randomness — the standard GAN serving interface.

CLI: ``tpufed export <checkpoint> --n 100 --out g.stablehlo``.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

MANIFEST_SUFFIX = ".json"


def export_generator(runner, state, n: Optional[int] = None,
                     platforms: Optional[Sequence[str]] = None):
    """Export ``runner.gen`` closed over ``state`` as a ``jax.export``
    Exported object taking ``z: float32[n, latent_dim]``.

    ``n``: the serving batch.  An int bakes a fixed batch; ``None``
    exports a **batch-polymorphic** artifact via shape polymorphism — the
    symbolic batch is ``m*b`` where ``m = runner.gen_batch_multiple``
    (num_servers for the per-server-quota families, so the divisibility
    constraint is structural; 1 = any batch).

    ``platforms``: lowering targets (e.g. ``["cpu", "tpu"]``); default =
    the current default backend.
    """
    if runner.gen is None:
        raise ValueError(f"{runner.cfg.algo} runner exposes no gen()")
    m = runner.gen_batch_multiple
    if n is None:
        dim = f"{m}*b" if m > 1 else "b"
        (batch,) = jax.export.symbolic_shape(f"({dim},)")
    else:
        if n % m:
            raise ValueError(
                f"n={n} not divisible by the runner's serving batch "
                f"multiple {m} (num_servers)")
        batch = n
    serve = jax.jit(lambda z: runner.gen(state, z))
    spec = jax.ShapeDtypeStruct((batch, runner.cfg.latent_dim), jnp.float32)
    return jax.export.export(
        serve, platforms=list(platforms) if platforms else None)(spec)


def export_client_generator(runner, state, client: int,
                            n: Optional[int] = None,
                            platforms: Optional[Sequence[str]] = None):
    """Export client ``client``'s PERSONALIZED generator
    (``runner.gen_client``): head ``c % k`` of server ``c // k``'s G for
    the multi-path families (mixed-gan.py:242-252 routing), the server's
    G for single-path CAP-GAN.  Unlike the painter blend of
    :func:`export_generator`, the batch has no per-server multiple
    constraint — the artifact is one client's own generator,
    ``z[n, latent] -> samples[n]``.  ``n=None`` exports batch-polymorphic.
    """
    if runner.gen_client is None:
        raise ValueError(
            f"{runner.cfg.algo} has no per-client personalized generator "
            "(gen_client is CGL-family only)")
    if not 0 <= client < runner.cfg.num_workers:
        raise ValueError(f"client {client} out of range "
                         f"[0, {runner.cfg.num_workers})")
    if n is None:
        (batch,) = jax.export.symbolic_shape("(b,)")
    else:
        batch = n
    serve = jax.jit(lambda z: runner.gen_client(state, z, client))
    spec = jax.ShapeDtypeStruct((batch, runner.cfg.latent_dim), jnp.float32)
    return jax.export.export(
        serve, platforms=list(platforms) if platforms else None)(spec)


def export_imported(model, params, state, n: Optional[int] = None,
                    latent_dim: int = 100,
                    platforms: Optional[Sequence[str]] = None):
    """Export an **imported reference generator** (utils/torch_import.py)
    with the same serving contract as :func:`export_generator`:
    eval-mode forward, weights baked in, ``z[n, latent] -> samples``.
    Multi-path heads are flattened onto the batch axis, matching the
    reference's ``torch.cat(img, dim=0)`` forward (model/mnist_model.py:66)
    — callers get ``(num_heads * n, *img)``."""
    def serve(z):
        y, _ = model.apply(params, state, z, train=False)
        if model.multipath:
            y = y.reshape((-1,) + y.shape[2:])
        return y

    if n is None:
        (batch,) = jax.export.symbolic_shape("(b,)")
    else:
        batch = n
    spec = jax.ShapeDtypeStruct((batch, latent_dim), jnp.float32)
    return jax.export.export(
        jax.jit(serve), platforms=list(platforms) if platforms else None)(spec)


def save_generator(exported, path: str,
                   manifest_extra: Optional[Dict[str, Any]] = None) -> Dict:
    """Serialize an Exported to ``path`` plus a ``path.json`` manifest."""
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)

    def _dims(aval):
        # symbolic dims (batch-polymorphic export) serialize as strings
        return [d if isinstance(d, int) else str(d) for d in aval.shape]

    manifest = {
        "format": "jax.export/stablehlo",
        "calling_convention_version": exported.calling_convention_version,
        "platforms": list(exported.platforms),
        "in_shape": _dims(exported.in_avals[0]),
        "in_dtype": str(exported.in_avals[0].dtype),
        "out_shape": _dims(exported.out_avals[0]),
        "out_dtype": str(exported.out_avals[0].dtype),
        "bytes": len(blob),
    }
    manifest.update(manifest_extra or {})
    with open(path + MANIFEST_SUFFIX, "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def load_generator(path: str):
    """Load a serialized artifact; returns ``(callable z -> samples,
    manifest dict)``.  The callable runs the baked weights on the current
    backend (must be one of the manifest's ``platforms``)."""
    with open(path, "rb") as f:
        exported = jax.export.deserialize(f.read())
    manifest = {}
    if os.path.exists(path + MANIFEST_SUFFIX):
        with open(path + MANIFEST_SUFFIX) as f:
            manifest = json.load(f)
    return exported.call, manifest
