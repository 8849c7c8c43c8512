"""Orbax checkpointing with reference-compatible run-directory semantics.

The reference saves three kinds of checkpoints under ``<run>/models/``
(trainer/model_trainer.py:52-55, 130-143):
  * best-per-split        -> model_best_validation / model_best_test
  * periodic intermediate -> model_intermediate (every 1000 iters)
  * final                 -> model_end_<iter>

plus ``best_<split>_error.txt`` next to them. We keep the same stems (orbax
directories instead of .pt files) and additionally persist the full
(params, opt_state, step, extra_vars, data-RNG seed) tuple so preempted runs
resume exactly — the reference's resume helper exists but is never wired
(trainer/model_trainer.py:145-160); here it is first-class.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

import numpy as np
import orbax.checkpoint as ocp

# orbax narrates every save at INFO/WARNING through absl (incl. a benign
# single-process "Skipping merge of OCDBT" warning per save); keep run logs
# readable
for _name in ("absl", "orbax", "orbax.checkpoint"):
    logging.getLogger(_name).setLevel(logging.ERROR)

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # import-time cycle: train.__init__ -> trainer -> ckpt
    from wmfml_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, run_dir: str):
        self.models_dir = os.path.abspath(os.path.join(run_dir, "models"))
        os.makedirs(self.models_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.models_dir, name)

    def save(self, name: str, state: "TrainState", extra: Optional[dict] = None):
        """Async save: returns once the device arrays are snapshotted; disk
        serialization overlaps subsequent training (preemption-recovery
        pattern, SURVEY §5 checkpoint plan). Ordering is preserved by
        waiting out any in-flight save first."""
        payload = {
            "step": state.step,
            "params": state.params,
            "extra_vars": state.extra_vars,
            "opt_state": state.opt_state,
        }
        if extra:
            payload["extra"] = extra
        path = self._path(name)
        self._ckpt.wait_until_finished()   # previous async save, if any
        self._ckpt.save(path, payload, force=True)

    def wait(self):
        """Block until the last async save is durable on disk."""
        self._ckpt.wait_until_finished()

    def restore(self, name_or_path: str, state: "TrainState") -> "TrainState":
        self._ckpt.wait_until_finished()
        if os.path.isabs(name_or_path) or os.path.exists(name_or_path):
            path = os.path.abspath(name_or_path)  # explicit path (any cwd-rel)
        else:
            path = self._path(name_or_path)       # bare name in this run
        target = {
            "step": state.step,
            "params": state.params,
            "extra_vars": state.extra_vars,
            "opt_state": state.opt_state,
        }
        try:
            restored = self._ckpt.restore(path, target)
        except Exception as e:
            # an opt_state tree-structure mismatch almost always means the
            # checkpoint was saved under the opposite `flatten_opt` setting
            # (optax.flatten stores ONE concatenated vector per moment;
            # default false since round 4, round-3 checkpoints are
            # flattened). Adam/SGD are elementwise, so the two layouts are
            # value-identical — detect the saved layout and convert.
            msg = str(e)
            if "opt_state" in msg and (
                    "structure" in msg or "mismatch" in msg
                    or "tree" in msg.lower()):
                try:
                    restored = self._restore_adapting_opt_layout(path, target)
                except Exception as conv_e:  # conversion is best-effort
                    raise RuntimeError(
                        f"checkpoint restore failed for {path!r}: {e}\n"
                        "The 'opt_state' subtree mismatches (checkpoint "
                        "probably saved with the opposite `flatten_opt` "
                        "setting) and automatic layout conversion also "
                        f"failed ({conv_e}). Set `flatten_opt` in the "
                        "config to match the save-time layout — the model "
                        "params are unaffected either way."
                    ) from e
            else:
                raise
        return state.replace(step=restored["step"], params=restored["params"],
                             extra_vars=restored["extra_vars"],
                             opt_state=restored["opt_state"])

    def _restore_adapting_opt_layout(self, path: str, target: dict) -> dict:
        """Restore with the opt_state converted between the optax.flatten
        single-vector layout and the per-leaf layout (values identical for
        elementwise optimizers; only the storage layout differs)."""
        raw = self._ckpt.restore(path)   # structure as saved (nested dicts)
        restored = {k: raw[k] for k in ("step", "params", "extra_vars")}
        restored["opt_state"] = _convert_opt_state(
            raw["opt_state"], target["opt_state"], target["params"])
        logging.getLogger("wmfml_tpu").warning(
            "checkpoint %s: opt_state saved under the opposite flatten_opt "
            "layout; auto-converted at restore (values identical)", path)
        return restored

    def save_best_error(self, run_dir: str, split: str, step: int, error: float):
        """best_<split>_error.txt parity (trainer/model_trainer.py:135-138)."""
        with open(os.path.join(run_dir, f"best_{split}_error.txt"), "w") as f:
            f.write(f"iter: {step}, {split} error: {error}\n")


def _convert_opt_state(saved_opt, target_opt, params):
    """Re-lay saved opt_state values into ``target_opt``'s tree structure.

    optax.flatten stores each moment as ONE concatenated ravel of the param
    leaves (tree order); the unflattened layout mirrors the params tree.
    Elementwise optimizers (Adam/AdamW/SGD) are value-identical across the
    two, so conversion is pure splitting/concatenation. Works in both
    directions by walking the target leaves in order: wherever a
    params-shaped block begins, one flat vector is consumed (split) or
    emitted (concatenated); every other leaf (step counts, scalars) passes
    through unchanged."""
    import jax

    p_shapes = [tuple(p.shape) for p in jax.tree_util.tree_leaves(params)]
    sizes = [int(np.prod(s, dtype=np.int64)) for s in p_shapes]
    total = int(sum(sizes))
    splits = np.cumsum(sizes)[:-1]

    s_leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(saved_opt)]
    t_leaves, t_def = jax.tree_util.tree_flatten(target_opt)

    out, si, ti = [], 0, 0
    while ti < len(t_leaves):
        t_block = [tuple(np.shape(x)) for x in t_leaves[ti:ti + len(p_shapes)]]
        if t_block == p_shapes and not (
                len(p_shapes) == 1 and s_leaves[si].shape == p_shapes[0]):
            # target wants the per-leaf layout here; saved has one flat vec
            flat = s_leaves[si]
            if flat.ndim != 1 or flat.size != total:
                raise ValueError(
                    f"expected a flattened moment of size {total}, got "
                    f"shape {flat.shape}")
            si += 1
            out.extend(part.reshape(shp) for part, shp in
                       zip(np.split(flat, splits), p_shapes))
            ti += len(p_shapes)
        elif (tuple(np.shape(t_leaves[ti])) == (total,)
              and t_leaves[ti].ndim == 1
              and [tuple(x.shape) for x in
                   s_leaves[si:si + len(p_shapes)]] == p_shapes):
            # target wants the flat layout; saved has per-leaf moments
            out.append(np.concatenate(
                [x.ravel() for x in s_leaves[si:si + len(p_shapes)]]))
            si += len(p_shapes)
            ti += 1
        else:
            s = s_leaves[si]
            if tuple(np.shape(t_leaves[ti])) != tuple(s.shape):
                raise ValueError(
                    f"opt_state leaf shape mismatch beyond flatten layout: "
                    f"saved {s.shape} vs target {np.shape(t_leaves[ti])}")
            out.append(s)
            si += 1
            ti += 1
    if si != len(s_leaves):
        raise ValueError("saved opt_state has surplus leaves")
    return jax.tree_util.tree_unflatten(t_def, out)


def restore_params_only(path: str, like_variables: Any):
    """Load just model variables from a checkpoint dir (for evaluation CLIs)."""
    ckpt = ocp.StandardCheckpointer()
    target = {
        "step": np.zeros((), np.int32),
        "params": like_variables["params"],
        "extra_vars": {k: v for k, v in like_variables.items() if k != "params"},
        "opt_state": None,
    }
    # opt_state unknown at eval time; restore partially
    restored = ckpt.restore(os.path.abspath(path), target)
    return {"params": restored["params"], **restored["extra_vars"]}
