"""embulk_filter_copy_spark — a from-scratch PySpark-native CDC / incremental-ingest
engine generalizing civitaspo/embulk-filter-copy's fan-out-transform idea.

Reference semantics preserved (see SURVEY.md §7.1):
  * lossless, type-faithful fan-out to N sinks   (reference: CopyColumnVisitor.scala:17-56)
  * independent per-sink transform chains        (reference: BreakinBulkLoader.scala:104-108)
  * nested sink specs, flattened at plan time    (reference: TestCopyFilterPlugin.scala:192-252)
  * idempotent resume via commit tracking        (reference: ReuseInputExecutorPlugin.scala:61-64)
  * incremental cursor / lineage after each run  (reference: BreakinBulkLoader.scala:180-189)

Everything here is idiomatic PySpark: DataFrame/SQL plans optimized by Catalyst,
Structured Streaming microbatches, Arrow-vectorized pandas UDFs for the few spots
built-ins can't express. No RDDs, no per-row Python in any hot path.
"""

__version__ = "0.1.0"
