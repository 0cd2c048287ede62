"""Parameter checkpointing via Orbax.

Replaces the reference's ``torch.save`` whole-module snapshots
(reference: dqn.py:635-655, ddpg.py:67-75): agents save their parameter
pytrees under ``runs/<LOG_DIR>/`` and resume by restoring them into fresh
trainers — the same run-directory layout the reference uses.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np

__all__ = ["save_params", "load_params"]


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_params(run_dir: str, tree: Dict[str, Any]) -> str:
    """Save a dict of parameter pytrees to <run_dir>/params."""
    path = os.path.abspath(os.path.join(run_dir, "params"))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tree = jax.tree.map(np.asarray, tree)
    _checkpointer().save(path, tree, force=True)
    return path


def load_params(run_dir: str) -> Dict[str, Any]:
    path = os.path.abspath(os.path.join(run_dir, "params"))
    return _checkpointer().restore(path)
