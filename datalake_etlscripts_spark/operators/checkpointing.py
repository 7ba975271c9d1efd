"""Lineage-truncation policy for iterative operators.

``localCheckpoint`` (the default everywhere) stores the truncated
plan's blocks on EXECUTORS: no DFS round-trip, exactly right for
local[32] and for clusters with task-level retry only. But it cuts
the lineage — at cluster scale, losing an executor mid-iteration
loses blocks that have NO recompute path, killing the job. Reliable
``DataFrame.checkpoint`` writes the blocks to the SparkContext
checkpoint directory (HDFS / s3a:// on a real cluster) and survives
executor loss, at the cost of a DFS write per cut.

Every iterative operator (pagerank, label_propagation, kcore,
connected_components / _star, follow_version) therefore takes an
optional ``checkpoint_dir`` knob: when set, every
``checkpoint_every``-th round's cut becomes a reliable checkpoint —
intermediate rounds keep the cheap localCheckpoint, so on an executor
loss at most ``checkpoint_every - 1`` rounds re-run from the last
durable snapshot. When unset (default) behavior is unchanged:
localCheckpoint everywhere, zero DFS traffic.

Reliable cuts are forced EAGER: the point is that the snapshot is on
stable storage BEFORE later rounds build on it — a lazy reliable
checkpoint would defer the write to the final action and leave the
whole loop on executor memory anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# last directory this helper applied via setCheckpointDir — avoids a
# re-set (and the fully-qualified-URI comparison problem) per cut.
_applied_dir: list[str | None] = [None]


def cut_lineage(
    df: DataFrame,
    round_no: int = 0,
    checkpoint_dir: str | None = None,
    every: int = 5,
    eager: bool = False,
) -> DataFrame:
    """Truncate ``df``'s lineage: localCheckpoint by default; a
    reliable (DFS-backed) checkpoint on every ``every``-th round when
    ``checkpoint_dir`` is set. ``round_no`` is the 0-based iteration
    index; rounds ``every-1, 2*every-1, ...`` are the durable ones so
    a run shorter than ``every`` rounds never pays the DFS write."""
    if checkpoint_dir is not None and every > 0 and round_no % every == every - 1:
        sc = df.sparkSession.sparkContext
        if _applied_dir[0] != checkpoint_dir:
            sc.setCheckpointDir(checkpoint_dir)
            _applied_dir[0] = checkpoint_dir
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=eager)
