"""Reference-counting `.samples_` garbage collector (API parity).

In the compiled engine, garbage collection is *output selection*: nodes not
kept by the ``gc_strategy`` are never returned from the jitted program and
XLA dead-code-eliminates their intermediates (see ``engine/compile.py``).

This class reproduces the reference's host-side mechanism
(``garbage_collector.py:5-71``) for users who drive graphs manually and for
behavioural parity tests: ``strategy=None`` keeps everything; a list keeps
the listed nodes plus the sink and frees every other node's ``samples_`` as
soon as all of its children have been sampled.
"""

from __future__ import annotations

import collections
from collections.abc import Collection

__all__ = ["GarbageCollector"]


class GarbageCollector:
    def __init__(self, strategy=None):
        if not (strategy is None or isinstance(strategy, Collection)):
            raise TypeError(f"`strategy` must be None or a collection, got: {strategy}")
        self.strategy = strategy

    def set_sink(self, sink):
        """Set the sink node, whose samples will always be kept."""
        self.sink = sink
        if self.strategy is None:
            return self

        # Number of unsampled children per node; a node whose count reaches
        # zero has served every consumer and can be freed.
        self._unsampled_children = collections.defaultdict(int)
        for node in self.sink.nodes():
            for parent in node.get_parents():
                self._unsampled_children[parent] += 1
        return self

    def decrement_and_delete(self, node):
        """Mark ``node`` sampled; free parents with no unsampled children.

        Returns the list of garbage-collected nodes.
        """
        if not hasattr(self, "sink"):
            raise ValueError("You must call 'set_sink' first.")

        if self.strategy is None:
            return []

        garbage_collected = []
        for parent in node.get_parents():
            self._unsampled_children[parent] -= 1
            zero_count = self._unsampled_children[parent] == 0
            protected = parent in self.strategy
            if zero_count and not protected:
                del parent.samples_
                garbage_collected.append(parent)
            assert self._unsampled_children[parent] >= 0
        return garbage_collected
