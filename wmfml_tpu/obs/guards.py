"""Runtime failure guards.

The reference aborts the process on a non-finite loss
(`trainer/model_trainer.py:90-92`, `trainer/maml_trainer.py:221-223`). We keep
the same guard but raise a typed exception so callers (and tests) can handle
it; the train CLI converts it to exit code 1 for parity.
"""

from __future__ import annotations

import math


class NonFiniteLossError(RuntimeError):
    pass


def check_finite(loss, step: int, logger=None):
    """Raise NonFiniteLossError if the (host) scalar loss is NaN/Inf."""
    loss = float(loss)
    if not math.isfinite(loss):
        msg = f"Loss is NaN or Inf at iteration {step}: {loss}"
        if logger is not None:
            logger.error(msg)
        raise NonFiniteLossError(msg)
    return loss
