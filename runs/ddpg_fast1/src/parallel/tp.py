"""Tensor-parallel sharding-rule hooks for parameter trees.

SURVEY §2.3: the networks here are tiny 256-wide MLPs (reference
dqn.py:568-579), so TP is not load-bearing — but the framework provides
first-class PartitionSpec hooks so parameter trees CAN be sharded over a
model axis when scaled up.  Default: everything replicated.

Rules are (path-regex, PartitionSpec) pairs matched against the
"/"-joined flax param path (e.g. ``params/Dense_0/kernel``); the first
match wins.  :func:`shard_params` applies them over a mesh;
:func:`mlp_tp_rules` is the canonical recipe for fc stacks — alternate
column-/row-parallel Dense kernels so activations stay sharded between
layers (Megatron-style) with the final layer gathering.
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["param_path_specs", "shard_params", "mlp_tp_rules",
           "MODEL_AXIS"]

MODEL_AXIS = "model"

Rules = Sequence[Tuple[str, P]]


def _flat_paths(params):
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    paths = ["/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                      for k in path) for path, _ in flat]
    leaves = [leaf for _, leaf in flat]
    return paths, leaves, treedef


def param_path_specs(params, rules: Rules) -> List[P]:
    """Resolve each param leaf's PartitionSpec: first matching rule, else
    replicated (P())."""
    paths, leaves, _ = _flat_paths(params)
    specs = []
    for path, leaf in zip(paths, leaves):
        spec = P()
        for pattern, cand in rules:
            if re.search(pattern, path):
                # drop axes that don't fit the leaf's rank
                spec = P(*cand[:leaf.ndim]) if len(cand) > leaf.ndim \
                    else cand
                break
        specs.append(spec)
    return specs


def shard_params(params, mesh: Mesh, rules: Rules = ()):
    """Place a parameter tree on ``mesh`` according to ``rules``
    (unmatched leaves replicated)."""
    paths, leaves, treedef = _flat_paths(params)
    specs = param_path_specs(params, rules)
    placed = [jax.device_put(leaf, NamedSharding(mesh, spec))
              for leaf, spec in zip(leaves, specs)]
    return jax.tree_util.tree_unflatten(treedef, placed)


def mlp_tp_rules(axis: str = MODEL_AXIS) -> Rules:
    """Megatron-style rules for flax Dense stacks: first layer
    column-parallel (shard the output features), later hidden layers
    row-parallel on the input dim, biases follow their kernel's output
    sharding where possible."""
    return (
        (r"Dense_0/kernel$", P(None, axis)),   # column parallel
        (r"Dense_0/bias$", P(axis)),
        (r"Dense_1/kernel$", P(axis, None)),   # row parallel
        (r"Dense_\d+/kernel$", P()),           # output layers replicated
    )
