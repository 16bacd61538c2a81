"""Checkpointing: one mechanism replacing the reference's four.

The reference maintains four ad-hoc checkpoint formats (SURVEY §5): LAVIS
.pth with requires_grad filtering (runner_base.py:657-683), HF Trainer saves
with a custom img_proj splice (finetune.py:86-150), Lightning ModelCheckpoint
(chexpert_train.py:227-234), and CheXbert's kappa-gated torch.save
(run_bert.py:195-203). Here: orbax, saving {params, opt_state, step, extra}
atomically with async-friendly semantics; `keep` implements best/last
retention.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


_CHECKPOINTER = None


def _checkpointer():
    # singleton: constructing a new StandardCheckpointer per call trips
    # orbax's global async executor ("cannot schedule new futures after
    # shutdown") once a previous instance is garbage-collected
    global _CHECKPOINTER
    if _CHECKPOINTER is None:
        import orbax.checkpoint as ocp
        _CHECKPOINTER = ocp.StandardCheckpointer()
    return _CHECKPOINTER


def save_checkpoint(directory: str | Path, step: int, tree: Any,
                    metadata: Optional[Dict[str, Any]] = None,
                    name: Optional[str] = None) -> Path:
    """Write `tree` (any pytree of arrays) to directory/(name or step_N)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    tag = name if name is not None else f"step_{step}"
    path = (directory / tag).absolute()
    ckpt = _checkpointer()
    ckpt.save(path, jax.tree_util.tree_map(np.asarray, tree), force=True)
    ckpt.wait_until_finished()  # StandardCheckpointer saves asynchronously
    meta = {"step": int(step), **(metadata or {})}
    (directory / f"{tag}.meta.json").write_text(json.dumps(meta))
    return path


def load_checkpoint(directory: str | Path, name: str = "last",
                    target: Optional[Any] = None) -> tuple[Any, Dict[str, Any]]:
    """Load directory/name; `target` (a matching pytree of arrays) restores
    dtypes/shardings when given. Returns (tree, metadata)."""
    directory = Path(directory)
    path = (directory / name).absolute()
    if target is not None:
        tree = _checkpointer().restore(path, target=jax.tree_util.tree_map(
            np.asarray, target))
    else:
        tree = _checkpointer().restore(path)
    meta_path = directory / f"{name}.meta.json"
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return tree, meta


def latest_step(directory: str | Path) -> Optional[int]:
    directory = Path(directory)
    if not directory.exists():
        return None
    steps = []
    for p in directory.glob("step_*.meta.json"):
        try:
            steps.append(int(p.stem.split("_")[1].split(".")[0]))
        except (IndexError, ValueError):
            continue
    return max(steps) if steps else None


class BestKeeper:
    """Best/last retention (runner_base.py:417-426 best-by-val selection)."""

    def __init__(self, directory: str | Path, mode: str = "max"):
        self.directory = Path(directory)
        self.mode = mode
        self.best: Optional[float] = None

    def update(self, step: int, metric: float, tree: Any,
               metadata: Optional[Dict] = None) -> bool:
        save_checkpoint(self.directory, step, tree,
                        {**(metadata or {}), "metric": metric}, name="last")
        improved = (self.best is None or
                    (metric > self.best if self.mode == "max" else metric < self.best))
        if improved:
            self.best = metric
            save_checkpoint(self.directory, step, tree,
                            {**(metadata or {}), "metric": metric}, name="best")
        return improved
