"""SCD2 (slowly-changing-dimension type 2) history from an ordered change
log — every version of every key, with its validity interval in LSN space.

The merge path (`cdc/apply.py`) keeps only the FINAL state per key; many
downstream consumers of a CDC feed (audit, point-in-time training snapshots,
"as of commit X" joins) need the full version history instead. This operator
turns the same change log the replayer consumes (one row per change, op in
{I, U, D}, totally ordered per key by LSN) into a versioned table:

  * one output row per non-delete change: the attribute values of that
    version, ``valid_from_lsn`` = its own LSN, ``valid_to_lsn`` = the LSN
    of the NEXT change to the same key (NULL while still open);
  * a delete closes the previous version (its LSN becomes that version's
    ``valid_to_lsn``) and emits no version row of its own, so a key whose
    last change is a delete has no open version — exactly the "absent from
    current state" semantics the merge path produces;
  * ``is_current`` marks the open version.

Scale shape: ONE shuffle — a window partitioned by the key — identical to
the LWW dedup the replayer already pays (`cdc/dedup.py:40`), so the history
table costs no more than the current-state table. Skewed hot keys are
bounded by per-key version counts, not corpus size; the partition column for
a materialized history table should be a bucket of the key, same as the
merge sink.

Reference parity: the reference pipeline has no history surface (it streams
pages through `filters` config, embulk-filter-copy.gemspec:1-20 scope); this
generalizes its pass-through copy into the versioned-feed a lake CDC
consumer expects.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Build the SCD2 version table from an ordered change log.

    ``changes`` must carry at most one row per (key, LSN) — feed it through
    the LWW dedup first if the transport can duplicate (the replayer's
    at-least-once file source can) — duplicate (key, LSN) rows cannot be
    detected at plan-build time and would yield zero-width intervals in an
    arbitrary tie order. All non-key, non-op columns ride along as version
    attributes.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(
        F.col(lsn_col).asc()
    )
    versioned = changes.withColumn(
        "valid_to_lsn", F.lead(F.col(lsn_col)).over(w)
    )
    return (
        versioned.filter(F.col(op_col) != F.lit(delete_op))
        .withColumn("is_current", F.col("valid_to_lsn").isNull())
        .withColumnRenamed(lsn_col, "valid_from_lsn")
        .drop(op_col)
    )


def snapshot_as_of(
    history: DataFrame,
    as_of_lsn: int,
    from_col: str = "valid_from_lsn",
    to_col: str = "valid_to_lsn",
) -> DataFrame:
    """Point-in-time slice of an SCD2 table: the versions live at
    ``as_of_lsn`` (interval semantics: from inclusive, to exclusive —
    matching `lake/table.py` time travel, which is snapshot-inclusive).
    Pure narrow filter; on a history table partitioned by key-bucket this
    prunes nothing by itself, but a materialized table can additionally
    sort-order files by ``valid_from_lsn`` so footer min/max skips closed
    eras."""
    return history.filter(
        (F.col(from_col) <= F.lit(as_of_lsn))
        & (F.col(to_col).isNull() | (F.col(to_col) > F.lit(as_of_lsn)))
    ).drop("is_current")
