"""A minimal ACID lakehouse table format ("LakeTable") over parquet.

The sandbox image ships no Iceberg/Delta jars, so the engine implements the
small slice of a table format that the CDC replayer needs — and implements it
the way Iceberg does, because the commit-manifest protocol IS the engine's
exactly-once story (SURVEY.md §7.3: "commit-manifest protocol — the core
custom piece"):

  * snapshot isolation: an immutable JSON snapshot per version listing data
    files; readers resolve the current snapshot once and never see partial
    writes,
  * atomic commits: a snapshot file is created with O_EXCL (optimistic
    concurrency — a losing concurrent writer gets ``CommitConflict``) and the
    CURRENT pointer is swapped with an atomic rename,
  * hash-bucket layout: data files are grouped by
    ``pmod(xxhash64(*key_columns), n_buckets)`` so a MERGE rewrites only the
    buckets its batch touches (copy-on-write, like Iceberg CoW) and the
    merge join is co-partitioned by construction,
  * schema evolution by field id (add / rename / type-widen), old files are
    projected to the current schema at read time,
  * commit metadata: every snapshot carries the (run_id, epoch, seq) commit
    manifest rows written atomically WITH the data — the direct analogue of
    the reference's committed-task skip (ReuseInputExecutorPlugin.scala:61-64).

At 100 TB the same layout holds: n_buckets scales to thousands, bucket
rewrites are independent Spark tasks, and the manifest JSON would move to an
Avro manifest list — the protocol (O_EXCL snapshot + pointer swap) is
object-store-compatible (S3 conditional PUT).
"""

from embulk_filter_copy_spark.lake.schema import Field, TableSchema
from embulk_filter_copy_spark.lake.table import CommitConflict, LakeTable

__all__ = ["Field", "TableSchema", "LakeTable", "CommitConflict"]
