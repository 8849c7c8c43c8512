"""Model output contract.

Every model returns ``ModelOutput(mu, var, kl, extras)``:
  * mu  [T, Q, Dy] — predicted means (reference ``pr_mu``)
  * var — predicted variance or None (reference ``pr_var``)
  * kl  — scalar KL term for MR models, else 0.0 (reference ``kl``)
  * extras — dict of auxiliary tensors (FCL representations etc.); the train
    step composes contrastive losses from these instead of the model
    computing losses internally (functional-core design).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional


class ModelOutput(NamedTuple):
    mu: Any
    var: Optional[Any] = None
    kl: Any = 0.0
    extras: Dict[str, Any] = {}
