"""Lineage truncation for iterative / multi-pass pipelines.

Every iterative operator (BFS/label-propagation/PageRank rounds, the
quintile passes, HITS half-rounds, transitive closure) must cut plan
lineage per round — otherwise the executed plan re-nests the whole
upstream tree per round × consumer (measured in r13: 5,716 Exchange
nodes on graph_kcore, 35k plan nodes on er_transitive_merge) and
planning time grows superlinearly.

Two mechanisms, selected once per process:

* ``localCheckpoint(eager=True)`` — the default.  Blocks live in
  executor storage, so the cut is cheap (no FS round-trip), but the
  storage is NON-RELIABLE: on a real cluster an executor loss makes
  the checkpointed blocks unrecoverable and the query fails.  That is
  the right trade on ``local[N]`` (one process — if it dies, the query
  dies anyway) and acceptable where recompute-on-loss is tolerable.
* reliable ``checkpoint(eager=True)`` — opt-in for cluster deploys via
  ``SPARK_GRAFT_CHECKPOINT_DIR=<fault-tolerant path>`` (HDFS/object
  store).  Survives executor loss at the cost of a write+read of each
  round's state through the checkpoint dir.

The env var is read per call (cheap), so tests can flip modes without
rebuilding sessions.  ``df.transform(cut_lineage)`` keeps call sites
chain-shaped.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and truncate its plan lineage (eager).

    Default: ``localCheckpoint``.  With ``SPARK_GRAFT_CHECKPOINT_DIR``
    set, uses reliable ``checkpoint()`` into that directory instead
    (set once per SparkContext, first use wins).
    """
    ck_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if ck_dir:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            sc.setCheckpointDir(ck_dir)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
