"""CDC (change-data-capture) log compaction: upsert/delete event streams
→ SCD2 history intervals and latest-state snapshots — the MERGE INTO /
table-maintenance pattern a lakehouse ingest pipeline runs on every
sync, composed here from one window pass.

Semantics (Debezium/Delta-CDF shaped): each key's changes are ordered by
(ts, tiebreak); an upsert opens a validity interval at its ts; ANY next
change for the key (upsert or delete) closes it; deletes emit no row of
their own. A key's last change being an upsert makes that row current
(valid_to NULL). Re-deletes and delete-then-upsert sequences fall out of
the same lead() — no special cases.

Scale: one window partitioned by key (the natural CDC shuffle — same key
volume MERGE INTO would shuffle); latest_state is the same window keyed
take-last, no join. History output ≈ #upserts rows, independent of
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    op_col: str = "op",
    tiebreak_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """changes (+op column: delete_op or any upsert marker) → SCD2 rows:
    input columns + valid_from_us / valid_to_us (NULL = open) +
    is_current. Delete rows close intervals but are not emitted."""
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    tus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (
        changes.withColumn("_tus", tus)
        .withColumn("_next_us", F.lead("_tus").over(w))
        .filter(F.col(op_col) != delete_op)
        .select(
            "*",
            F.col("_tus").alias("valid_from_us"),
            F.col("_next_us").alias("valid_to_us"),
            F.col("_next_us").isNull().alias("is_current"),
        )
        .drop("_tus", "_next_us")
    )


def latest_state(
    changes: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    op_col: str = "op",
    tiebreak_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """The compacted table: one row per key whose LAST change is an
    upsert (deleted keys vanish) — exactly MERGE INTO replay order."""
    order = [F.col(ts_col).desc()] + (
        [F.col(tiebreak_col).desc()] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != delete_op))
        .drop("_rn")
    )


def merge_upsert(
    target: DataFrame,
    changes: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    op_col: str = "op",
    tiebreak_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """MERGE INTO apply — one change batch folded into a target table
    (Delta/Iceberg MERGE semantics with whole-row upserts):

      WHEN MATCHED AND op = delete  THEN DELETE
      WHEN MATCHED (upsert)         THEN UPDATE (replace the row)
      WHEN NOT MATCHED (upsert)     THEN INSERT

    The batch is first deduplicated per key — LAST writer by (ts,
    tiebreak) wins, the Debezium/Delta-CDF convention for multi-change
    batches. `changes` must carry every target column (whole-row
    upserts) plus ts/op; the result has exactly the target's schema.

    Plan shape, chosen for the 100 TB target / small-batch asymmetry:
    NOT a full-outer join (which Spark cannot broadcast on either
    side). Instead

        merged = target LEFT ANTI JOIN touched_keys   (broadcastable)
                 UNION ALL surviving upserts

    so the big side is one broadcast-hash anti join probed in place —
    zero shuffle of the target — and only the deduped batch moves.
    """
    order = [F.col(ts_col).desc()] + (
        [F.col(tiebreak_col).desc()] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    touched = latest.select(key_col)
    untouched = target.join(F.broadcast(touched), key_col, "left_anti")
    upserts = latest.filter(F.col(op_col) != delete_op).select(
        *target.columns
    )
    return untouched.unionByName(upserts)
