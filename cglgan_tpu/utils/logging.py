"""Run-directory management and structured metrics logging.

Replaces the reference's observability stack — timestamped
``./logger/<SimulationName>/`` dirs (CGLGAN/MNIST/main.py:485-491), prints
under a lock, pandas ``df.append`` -> ``.xlsx`` per tick (uses an API removed
from pandas; FLGAN/2DMG/flgan.py:102) — with a structured JSONL stream plus a
CSV mirror (no openpyxl in this image), a JSON config dump, and an optional
TensorBoard scalar stream (``tensorboard=True`` / ``--tensorboard``; scalars
land under ``<run>/tb/`` next to the ``--profile`` traces so metrics and
xprof live in one TensorBoard).
"""
from __future__ import annotations

import csv
import dataclasses
import json
import os
import time
from typing import Dict, Optional


class RunDir:
    """A run directory: ``<root>/<name>/`` with config.json, metrics.jsonl,
    metrics.csv and image artifacts."""

    def __init__(self, root: str = "./logger", name: Optional[str] = None,
                 cfg=None, tensorboard: bool = False):
        if name is None:
            stamp = time.strftime("%Y-%m-%d_%H-%M-%S")
            algo = getattr(cfg, "algo", "run") if cfg is not None else "run"
            ds = getattr(cfg, "dataset", "") if cfg is not None else ""
            iid = getattr(cfg, "iid", "") if cfg is not None else ""
            name = f"{stamp}-{algo}-{ds}-iid{iid}"
        self.path = os.path.join(root, name)
        os.makedirs(self.path, exist_ok=True)
        jsonl_path = os.path.join(self.path, "metrics.jsonl")
        self._csv_path = os.path.join(self.path, "metrics.csv")
        self._csv_fields = None
        self._records = []
        # Resuming into an existing run dir (``--resume`` with the same
        # ``--name``): carry the prior ticks forward so metrics.csv /
        # metrics.xlsx stay complete across the restart instead of silently
        # restarting from the resume round (jsonl alone appends correctly).
        if os.path.isfile(jsonl_path) and os.path.getsize(jsonl_path) > 0:
            with open(jsonl_path) as f:
                for line in f:
                    if line.strip():
                        self._records.append(json.loads(line))
            if self._records:
                self._csv_fields = list(self._records[0].keys())
                with open(self._csv_path, "w", newline="") as f:
                    w = csv.DictWriter(f, fieldnames=self._csv_fields,
                                       extrasaction="ignore")
                    w.writeheader()
                    w.writerows(self._records)
        self._jsonl = open(jsonl_path, "a")
        self._tb = None
        if tensorboard:
            # torch (CPU) ships in this image; degrade gracefully elsewhere
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(self.file("tb"))
            except ImportError:
                import warnings
                warnings.warn("tensorboard requested but not importable; "
                              "continuing with JSONL/CSV only")
        if cfg is not None:
            with open(os.path.join(self.path, "config.json"), "w") as f:
                json.dump(dataclasses.asdict(cfg), f, indent=2)

    def file(self, name: str) -> str:
        return os.path.join(self.path, name)

    def log(self, record: Dict) -> None:
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        self._records.append(dict(record))
        fields = list(record.keys())
        new_file = self._csv_fields is None
        if new_file:
            self._csv_fields = fields
        with open(self._csv_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._csv_fields,
                               extrasaction="ignore")
            if new_file:
                w.writeheader()
            w.writerow(record)
        # Excel export per tick like the reference (df.to_excel every eval,
        # FLGAN/2DMG/flgan.py:102-103) — stdlib writer, no openpyxl needed
        from cglgan_tpu.utils.xlsx import write_xlsx
        write_xlsx(os.path.join(self.path, "metrics.xlsx"), self._records)
        if self._tb is not None:
            step = int(record.get("round", len(self._records)))
            for k, v in record.items():
                if k != "round" and isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)
            self._tb.flush()

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
