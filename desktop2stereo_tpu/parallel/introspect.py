"""Jaxpr introspection helpers for multi-chip artifacts and tests.

The dryrun artifact (`__graft_entry__.dryrun_multichip`) and the parallel
test suite both need to PROVE that the Pallas hot kernels survive a
TP/SP trace (VERDICT r02: force-disabling them left the sharded path
without flash attention) — they do it by counting primitives in the
closed jaxpr, recursing through nested sub-jaxprs (pjit, shard_map,
custom_vjp bodies, …).
"""
from __future__ import annotations

from typing import Any

import jax


def count_prims(jaxpr: Any, name: str) -> int:
    """Count equations whose primitive name contains `name`, recursing into
    every nested jaxpr carried in eqn params (pjit/shard_map/scan bodies)."""
    n = 0
    for eqn in jaxpr.eqns:
        if name in eqn.primitive.name:
            n += 1
        for v in eqn.params.values():
            leaves = jax.tree_util.tree_leaves(
                v, is_leaf=lambda x: hasattr(x, "eqns") or hasattr(x, "jaxpr"))
            for j in leaves:
                if hasattr(j, "jaxpr"):
                    n += count_prims(j.jaxpr, name)
                elif hasattr(j, "eqns"):
                    n += count_prims(j, name)
    return n
