"""Model summaries: parameter counts per subtree (the reference prints
torchinfo.summary at pretraining/train.py:122)."""
from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def _leaf_size(x) -> tuple[int, int]:
    if hasattr(x, "size") and hasattr(x, "dtype"):
        return int(np.prod(x.shape)) if x.shape else 1, np.dtype(x.dtype).itemsize
    return 0, 0


def param_count(tree: Any) -> int:
    return sum(_leaf_size(l)[0] for l in jax.tree_util.tree_leaves(tree))


def param_bytes(tree: Any) -> int:
    return sum(n * b for n, b in
               (_leaf_size(l) for l in jax.tree_util.tree_leaves(tree)))


def summarize(tree: Any, depth: int = 1, _prefix: str = "") -> str:
    """Indented per-subtree parameter counts down to ``depth`` levels."""
    lines = []

    def fmt(n):
        for unit in ("", "K", "M", "B"):
            if n < 1000:
                return f"{n:.1f}{unit}" if unit else str(n)
            n /= 1000
        return f"{n:.1f}T"

    def walk(node, name, level):
        total = param_count(node)
        lines.append(f"{'  ' * level}{name}: {fmt(total)} params, "
                     f"{param_bytes(node) / 1e6:.1f} MB")
        if level < depth and isinstance(node, dict):
            for k in node:
                walk(node[k], k, level + 1)
        elif level < depth and isinstance(node, (list, tuple)) and node:
            walk(node[0], "[0] (x%d)" % len(node), level + 1)

    walk(tree, _prefix or "model", 0)
    return "\n".join(lines)
