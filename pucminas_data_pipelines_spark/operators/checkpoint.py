"""Checkpoint storage hygiene for iterative operators.

Every iterative operator here (LPA / two-phase connected components,
delta-BFS, PageRank, k-core peeling, Lloyd k-means) truncates lineage
once per round with an eager ``localCheckpoint`` — without it the plan
references the previous round twice and grows exponentially (persist
alone caches data but keeps lineage; a 12-round loop OOMs the driver
just stringifying the plan). The flip side is storage: each round's
checkpoint pins RDD blocks in executor memory until the JVM
ContextCleaner happens to collect the dropped Python reference, so a
long-running loop on a big graph accumulates O(rounds) dead state.

``free_local_checkpoint`` releases a CONSUMED round's blocks
immediately. Contract: the frame must be a ``localCheckpoint`` result
that no later computation references — after this call the frame is
unusable (lineage already truncated, blocks gone; any action on it
raises CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND). Callers therefore free only
the previous iteration's state, after the current iteration's
checkpoint has materialized (eager=True) and any convergence probe that
reads the old frame has run.

Best-effort by design: the block release reaches the checkpointed RDD
through the analyzed plan's ``LogicalRDD.rdd`` (the stable seam Spark
itself uses to rewrap a checkpoint as a query plan); if that JVM shape
ever changes the call degrades to a no-op and the ContextCleaner path
reclaims the blocks eventually, exactly as before this module existed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def free_local_checkpoint(df: DataFrame) -> None:
    """Release the executor blocks behind a consumed localCheckpoint'd
    DataFrame now, instead of waiting for the ContextCleaner. See module
    docstring for the (strict) usage contract."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass
