"""Partition-shape helpers for compute-heavy narrow stages.

A parquet scan's task count is ``ceil(bytes / maxPartitionBytes)`` —
bytes, not compute. Stages whose per-row cost dwarfs their byte size
(tokenize + explode, per-row md5 banks, 64-d cosine folds, regex
batteries) therefore run on a handful of tasks whenever the input is
a few small files, serializing seconds of CPU work on one core while
the rest of the cluster idles (optimization guide §2.5 stragglers,
§6.1 input splits). The same trap re-appears mid-plan: AQE coalesces
a few-MB shuffle down to one partition even when each row still owes
an expensive projection.

``spread_for_compute`` round-robin-repartitions such an input up to
cluster width. Round-robin specifically:

- is NOT elided by the optimizer as redundant with a downstream
  hash requirement (a hash ``repartition`` on the same keys as a
  following aggregate is collapsed), and
- is NOT coalesced by AQE (user-specified partition counts are
  preserved),

so the spread reliably survives into the physical plan. The helper
is scale-adaptive, not a local[32] constant: when the input already
has at least cluster-width partitions (any real multi-file table at
production scale) it is a NO-OP — no shuffle is added. The shuffle it
does add on narrow inputs moves exactly the bytes the stage was going
to read anyway, once, and buys full-cluster parallelism for the
expensive projection above it.
"""

from __future__ import annotations

import logging
import re

from pyspark.sql import DataFrame

log = logging.getLogger(__name__)

#: Shuffle exchanges only — ``BroadcastExchange`` prints its broadcast
#: mode (``HashedRelationBroadcastMode``/``IdentityBroadcastMode``),
#: never a partitioning, so it does not match. A bare "Exchange"
#: substring match wrongly treated broadcast-join-bearing narrow
#: inputs as already shuffle-partitioned and skipped the spread.
_SHUFFLE_EXCHANGE = re.compile(
    r"\bExchange (hashpartitioning|rangepartitioning|"
    r"RoundRobinPartitioning|SinglePartition)"
)


def spread_for_compute(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Ensure ``df`` is at least cluster-width partitioned before a
    compute-heavy narrow stage. No-op (and no shuffle) when the input
    is already wide; round-robin repartition to
    ``defaultParallelism * min_factor`` otherwise.

    The width probe (``df.rdd.getNumPartitions``) is only safe on
    shuffle-free plans: under AQE, converting to an RDD materializes
    every non-result stage, so probing a SHUFFLE-bearing input would
    EXECUTE its upstream stages at construction. Such inputs are
    already shuffle-partitioned (cluster-wide by definition), so they
    are returned untouched without probing. A plan whose only
    exchanges are broadcasts IS probed (and spread when narrow): the
    probe materializes just the broadcast builds — small by
    definition, and paid at execution anyway."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    try:
        if _SHUFFLE_EXCHANGE.search(
            df._jdf.queryExecution().executedPlan().toString()
        ):
            return df  # shuffle-partitioned already; probing would run it
        current = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 - py4j wraps planner errors opaquely
        # Planner/py4j failure: fall back to spreading (the repartition
        # is always semantically safe), but say so — a silent fallback
        # here could mask a real planning regression.
        log.warning("spread_for_compute width probe failed; spreading", exc_info=True)
        current = 1
    if current >= target:
        return df
    return df.repartition(target)
