"""AQE-safe query observations.

The crawl engine rides every per-epoch metric on ``Dataset.observe`` so that
counting never costs a dedicated action (the counts are accumulated by the
same jobs that commit state — frontier.py's "FIRING INVARIANT").  That
design collides with one adaptive-execution rule:

``AQEPropagateEmptyRelation`` replaces an empty *runtime* query stage with an
empty LocalRelation and re-simplifies the operators above it.  Any interior
``CollectMetrics`` node inside the pruned subtree never executes, and Spark
fulfills its Observation with a SCHEMALESS EMPTY ROW when the job finishes.
A naive ``obs.get["k"]`` then raises ``KeyError`` — and in the sibling-empty
case (an inner join whose OTHER side turned out empty) the pruned observed
subtree may well have been non-empty, so substituting zeros would silently
mis-report real rows.

Round-5 first fixed this by excluding the AQE rule for the duration of the
crawl loop, but that exclusion was measured ~10-25% slower on the bench
crawl at sf0.1: the rule is exactly what short-circuits the frontier's
routinely empty channels (drained hosts, link-less fetches, zero-discovery
epochs), and without it every empty branch still pays its full shuffle
machinery.  ``RobustObservation`` keeps the optimization instead: it
remembers the observed frame and the aggregate expressions, and when the
observation comes back as the schemaless empty row it recomputes the same
aggregation directly.  Every engine call site persists the observed frame
for the epoch, so the fallback reads warm cache — and it only runs at all
on epochs where the pruning actually fired (i.e. cheap, mostly-empty ones).
"""

from __future__ import annotations

import itertools
from typing import Any

from pyspark.sql import Column, DataFrame, Observation

# process-wide monotone suffix: Observation names must never repeat within a
# SparkSession — id(obj) alone can recur after GC reuses an address, and a
# stale same-named listener would be fulfilled by the wrong query's metrics
_SEQ = itertools.count(1)


def obs_name(prefix: str, *parts: Any) -> str:
    return "_".join([prefix, *map(str, parts), str(next(_SEQ))])


class RobustObservation:
    """An ``Observation`` that survives AQE empty-relation pruning.

    ``attach()``-style constructor: wraps ``df.observe(...)`` and exposes the
    observed frame as ``.df``.  ``.get`` mirrors ``Observation.get`` (a
    property returning the metrics dict, blocking until the first job over
    the plan finishes) but falls back to re-aggregating the observed frame
    when the CollectMetrics node was pruned out of the executed plan.
    """

    def __init__(self, name: str, df: DataFrame, *exprs: Column) -> None:
        self._obs = Observation(name)
        self._exprs = exprs
        # keep the OBSERVED frame: callers persist this handle, so the
        # fallback aggregation below hits the epoch cache, not cold lineage
        self.df = df.observe(self._obs, *exprs)

    @property
    def get(self) -> dict[str, Any]:
        try:
            row = self._obs.get  # blocks until an action scans the plan
            if row:
                return row
        except Exception:
            # the schemaless empty row does not even survive PySpark's
            # row conversion: PythonSQLUtils.toPyRow asserts on it (this IS
            # the round-4 "crashed the metrics read" failure) — fall through
            pass
        # CollectMetrics node pruned at runtime: recompute the identical
        # aggregation.  The plan still contains the (already-fulfilled)
        # observe node — harmless, only a dataset's FIRST action ever
        # fulfills an Observation.  The recompute is exact in BOTH pruning
        # cases: observed-side-empty (zeros) and sibling-empty (real rows).
        return self.df.agg(*self._exprs).first().asDict()
