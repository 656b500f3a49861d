"""Plan inspection helpers — assertions about the physical plan so scale
properties (pushdown, pruning, broadcast, partial aggregation) are
regression-tested, not hoped for."""
