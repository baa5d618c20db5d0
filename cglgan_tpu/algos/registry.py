"""Algorithm registry: config -> Runner, loading data and partitioning.

Each algo name maps 1:1 onto a reference entry script (core.config.ALGOS).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from cglgan_tpu.core.config import FedGANConfig
from cglgan_tpu.data.gmm import gmm_dataset
from cglgan_tpu.data.mnist import load_image_dataset
from cglgan_tpu.data.partition import Partition, partition


def load_partition(cfg: FedGANConfig) -> Partition:
    if cfg.dataset == "2dmg":
        data, labels = gmm_dataset(cfg.num_class, cfg.num_sample,
                                   seed=cfg.seed)
        data, labels = np.asarray(data), np.asarray(labels)
        num_sample = cfg.num_sample * cfg.num_class  # eval pool: full scale
        # 2DMG FL-GAN/MD-GAN draw composition sizes from num_workers*2
        # (FLGAN/2DMG/flgan.py:292-296); others use num_workers**2
        comp = cfg.num_workers * 2 if cfg.algo in ("flgan", "mdgan") else None
        run_sub = False   # 2DMG iid=2 hands out whole label runs (tensor variant)
    else:
        data, labels = load_image_dataset(cfg.dataset, cfg.data_dir,
                                          seed=cfg.seed)
        if cfg.conv and data.shape[1] == 28:
            # conv LSGAN pair works at 32x32 (model/lsgan.py:7); the reference
            # bilinear-Resizes — zero-padding 2px preserves content exactly
            data = np.pad(data, ((0, 0), (2, 2), (2, 2)))
        # store shards flat (N, H*W): contiguous-lane layout makes the
        # per-round batch slice ~4x faster on TPU than (N, H, W) u8 gathers
        data = data.reshape(len(data), -1)
        num_sample = cfg.num_sample
        comp = None
        run_sub = True    # dataset-object variant subsamples runs (capgan.py:412-424)
    return partition(data, labels, cfg.num_workers, cfg.iid,
                     num_class=cfg.num_class, num_sample=num_sample,
                     seed=cfg.seed, composition_scale=comp,
                     run_subsample=run_sub)


def build_runner(cfg: FedGANConfig, part: Optional[Partition] = None,
                 mesh=None):
    """``mesh``: optional jax.sharding.Mesh with a 'clients' axis; stacked
    per-client state and data shards are placed split over it."""
    if part is None:
        part = load_partition(cfg)
    if cfg.pallas_sweep is True:
        # validate the forced flag for EVERY algo: eligible() raises for
        # ineligible configs, so e.g. `tpufed run cglgan --pallas-sweep on`
        # errors instead of silently running the XLA path
        from cglgan_tpu.ops.pallas import fused_sweep
        fused_sweep.eligible(cfg, mesh)
    if cfg.algo in ("flgan",):
        from cglgan_tpu.algos.fedavg_family import build_flgan
        return build_flgan(cfg, part, mesh)
    if cfg.algo == "fegan":
        from cglgan_tpu.algos.fedavg_family import build_fegan
        return build_fegan(cfg, part, mesh)
    if cfg.algo in ("acgan", "mdgan"):
        from cglgan_tpu.algos.mdgan_family import build_mdgan_family
        return build_mdgan_family(cfg, part, mesh)
    if cfg.algo in ("cglgan", "capgan", "mixgan"):
        from cglgan_tpu.algos.cgl_family import build_cgl_family
        return build_cgl_family(cfg, part, mesh)
    raise ValueError(f"unknown algo {cfg.algo!r}")
