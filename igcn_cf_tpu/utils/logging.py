"""Metric logging.

Keeps the reference's TensorBoard scalar naming scheme
``{model}_{trainer}/{stage}_{metric}@{k}`` and ``{model}_{trainer}/train_loss``
(reference trainer.py:50-55,76-78) so result diffing against reference runs is
mechanical. Primary sink is JSONL (always available); tensorboardX is used
when importable."""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:  # optional dependency
            from tensorboardX import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._f.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(step), "ts": time.time()})
            + "\n"
        )
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def record(
        self,
        model_name: str,
        trainer_name: str,
        stage: str,
        metrics: Dict[str, Dict[int, float]],
        epoch: int,
    ) -> None:
        for metric, by_k in metrics.items():
            for k, v in by_k.items():
                self.add_scalar(
                    f"{model_name}_{trainer_name}/{stage}_{metric}@{k}", v, epoch
                )

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
