"""Checkpoint / resume of sampled graph state.

The reference has no checkpointing; its only state capture is
``Node.copy()`` preserving ``samples_`` (SURVEY §5, modeling.py:353-404).
Here the sampled state of a graph is an explicit pytree —
``{node_id: samples}`` plus the node-id ordering — so it can be saved and
restored across processes.  Restoring matches nodes by their position in
the deterministic topological order, so a structurally-identical graph
built in a fresh process (where raw ``_id`` values differ) restores
correctly.
"""

from __future__ import annotations

import numpy as np

from probabilit_tpu.models.graph import topological_sort

__all__ = ["state_dict", "load_state_dict", "save", "load"]


def state_dict(sink):
    """Extract sampled state: topo-position -> samples array (or None)."""
    state = {}
    for pos, node in enumerate(topological_sort(sink)):
        if hasattr(node, "samples_"):
            value = node.samples_
            state[pos] = None if value is None else np.asarray(value)
    return state


def load_state_dict(sink, state):
    """Restore ``samples_`` onto the graph from a state dict."""
    topo = topological_sort(sink)
    for node in topo:
        if hasattr(node, "samples_"):
            delattr(node, "samples_")
    for pos, value in state.items():
        topo[int(pos)].samples_ = value
    return sink


def save(sink, path):
    """Save sampled graph state to an ``.npz`` file."""
    state = state_dict(sink)
    arrays = {}
    none_positions = []
    for pos, value in state.items():
        if value is None:
            none_positions.append(pos)
        else:
            arrays[f"node_{pos}"] = value
    np.savez_compressed(
        path, __none_positions__=np.asarray(none_positions, dtype=np.int64), **arrays
    )
    return path


def load(sink, path):
    """Load sampled graph state from an ``.npz`` file onto ``sink``'s graph."""
    with np.load(path, allow_pickle=False) as data:
        state = {}
        for name in data.files:
            if name == "__none_positions__":
                for pos in data[name]:
                    state[int(pos)] = None
            else:
                state[int(name.removeprefix("node_"))] = data[name]
    return load_state_dict(sink, state)
