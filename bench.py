"""Benchmark harness.

Headline metric (BASELINE.json): change-events/sec applied (upsert
throughput) — a full CDC replay (generate → LWW dedup → bucketed MERGE with
manifests) through the identical code path the streaming foreachBatch uses.
Both merge strategies are measured: copy-on-write (read-optimized) and
merge-on-read (write-optimized delta appends + compaction).

Scaling evidence: unless SPARK_GRAFT_SKIP_SCALING is set, the SAME replay
job runs at local[8] and local[32] on the same input — each in its OWN
subprocess with an identical JIT warmup pass, so neither level inherits a
warmer JVM (the N → 4N executor criterion, sandbox protocol).

Prints ONE JSON line:
  {"metric": ..., "value": events_per_sec, "unit": "events/sec",
   "queries": {name: sec}, "sf": ..., "replay": {...}, "replay_mor": {...},
   "scaling": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_BASE_ROWS = int(os.environ.get("EFC_BENCH_BASE_ROWS", "100000"))
BENCH_EVENTS = int(os.environ.get("EFC_BENCH_EVENTS", "1000000"))
SCALE_EVENTS = int(os.environ.get("EFC_SCALE_EVENTS", "400000"))
WARMUP_EVENTS = int(os.environ.get("EFC_WARMUP_EVENTS", "50000"))

HEADLINE_QUERIES = [
    "cdc_replay_events",
    "cdc_lww_latest",
    "cdc_salted_agg",
    "cdc_sessionize",
    "asof_join_clicks",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "window_topk_orders_per_segment",
    "dedup_minhash_pairs",
    "dedup_jaccard3_pairs",
    "dedup_simhash_pairs",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "text_quality_by_source",
    "multimodal_metadata",
]


def replay_throughput(
    spark,
    n_base: int,
    n_events: int,
    workdir: str,
    n_buckets: int,
    n_epochs: int = 4,
    merge_mode: str = "cow",
    compact_after: bool = False,
) -> dict:
    """Generate base + events, bootstrap the table, replay; events/sec over
    the apply phase (generation and bootstrap excluded; compaction included
    when compact_after=True so MOR pays its deferred cost)."""
    from pyspark.sql import functions as F

    from embulk_filter_copy_spark.cdc.replayer import replay_batch
    from embulk_filter_copy_spark.fixtures import REPO_FILES_SCHEMA, gen_change_events, gen_repo_files
    from embulk_filter_copy_spark.lake.table import LakeTable

    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    base = gen_repo_files(spark, n_base, seed=42)
    events_path = os.path.join(workdir, "events")
    gen_change_events(spark, n_base, n_events, seed=42, dup_rate=0.02).write.parquet(events_path)
    events = spark.read.parquet(events_path)

    table = LakeTable.create(
        spark, os.path.join(workdir, "tbl"), REPO_FILES_SCHEMA,
        key_columns=["repo", "path"], n_buckets=n_buckets,
    )
    table.append(base.withColumn("_lsn", F.lit(0)))

    t0 = time.time()
    results = replay_batch(
        spark, events, table, run_id="bench", n_epochs=n_epochs, merge_mode=merge_mode
    )
    if compact_after and merge_mode == "mor":
        table.compact()
    dur = time.time() - t0
    applied = sum(r.get("rows_applied", 0) for r in results)
    return {
        "mode": merge_mode + ("+compact" if compact_after and merge_mode == "mor" else ""),
        "events": n_events,
        "rows_applied": applied,
        "duration_sec": round(dur, 2),
        "events_per_sec": round(n_events / dur, 1),
    }


def run_queries(spark) -> dict:
    from embulk_filter_copy_spark.queries import ALL_QUERIES

    times = {}
    for name in HEADLINE_QUERIES:
        fn, _ = ALL_QUERIES[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 2)
    return times


def one_session(master: str, shuffle_partitions: int):
    from embulk_filter_copy_spark.session import get_spark

    return get_spark(
        app_name=f"efc-bench-{master}",
        master=master,
        shuffle_partitions=shuffle_partitions,
        extra_conf={"spark.driver.memory": "48g"},
    )


def scale_run(cores: int) -> None:
    """Subprocess entry: fresh JVM, identical warmup, timed replay."""
    spark = one_session(f"local[{cores}]", cores)
    replay_throughput(  # warmup: JIT + codegen caches, discarded
        spark, BENCH_BASE_ROWS // 10, WARMUP_EVENTS,
        f"/tmp/efc-bench/warm{cores}", n_buckets=64, n_epochs=1,
    )
    res = replay_throughput(
        spark, BENCH_BASE_ROWS // 2, SCALE_EVENTS,
        f"/tmp/efc-bench/scale{cores}", n_buckets=64,
    )
    print("SCALE_RESULT " + json.dumps(res))
    spark.stop()


def main() -> None:
    workroot = "/tmp/efc-bench"
    spark = one_session(f"local[{CPUS}]", CPUS)
    # small warmup so the headline number isn't first-epoch-JIT-biased
    replay_throughput(spark, BENCH_BASE_ROWS // 10, WARMUP_EVENTS,
                      os.path.join(workroot, "warm"), n_buckets=64, n_epochs=1)
    replay = replay_throughput(
        spark, BENCH_BASE_ROWS, BENCH_EVENTS, os.path.join(workroot, "replay"),
        n_buckets=2 * CPUS,
    )
    replay_mor = replay_throughput(
        spark, BENCH_BASE_ROWS, BENCH_EVENTS, os.path.join(workroot, "replay-mor"),
        n_buckets=2 * CPUS, merge_mode="mor", compact_after=True,
    )
    queries = run_queries(spark)
    spark.stop()

    scaling = None
    if not os.environ.get("SPARK_GRAFT_SKIP_SCALING"):
        runs = {}
        for cores in (8, 32):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--scale-run", str(cores)],
                capture_output=True, text=True, timeout=1800,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("SCALE_RESULT ")][-1]
            runs[cores] = json.loads(line[len("SCALE_RESULT "):])
        eff = runs[32]["events_per_sec"] / runs[8]["events_per_sec"] / 4.0
        scaling = {
            "events": SCALE_EVENTS,
            "protocol": "fresh JVM per level, identical warmup pass",
            "local8_events_per_sec": runs[8]["events_per_sec"],
            "local32_events_per_sec": runs[32]["events_per_sec"],
            "speedup_8_to_32": round(runs[32]["events_per_sec"] / runs[8]["events_per_sec"], 2),
            "scaling_efficiency": round(eff, 3),
        }

    out = {
        "metric": "change-events/sec applied (CDC upsert replay, LWW dedup + bucketed merge)",
        "value": max(replay["events_per_sec"], replay_mor["events_per_sec"]),
        "unit": "events/sec",
        "queries": queries,
        "sf": float(SF_DIR.rstrip("/").split("sf")[-1]) if "sf" in SF_DIR else SF_DIR,
        "replay": replay,
        "replay_mor": replay_mor,
        "scaling": scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--scale-run":
        scale_run(int(sys.argv[2]))
    else:
        main()
