"""Metrics/observability sink.

The reference logs scalars to TensorBoard (`trainer/base_trainer.py:37`,
`trainer/model_trainer.py:86-88`) and best errors to text files. We write the
same TensorBoard streams (``Loss/train``, ``Loss/validation``, ``Loss/test``)
when tensorboard is importable, and always mirror scalars into a
``metrics.jsonl`` file so runs are machine-readable without TB.
"""

from __future__ import annotations

import json
import os
import time


class MetricsWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter  # noqa: WPS433

                self._tb = SummaryWriter(log_dir)
            except Exception:  # tensorboard genuinely optional
                self._tb = None

    def add_scalar(self, tag: str, value, step: int):
        value = float(value)
        self._jsonl.write(
            json.dumps({"tag": tag, "value": value, "step": int(step),
                        "time": time.time()}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def flush(self):
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
