"""M3: multi-sink fan-out splitter — parity with the reference's test suite.

Mirrors TestCopyFilterPlugin.scala scenarios:
  1. plain copy to 2 sinks + passthrough unchanged     (:25-67)
  3. per-sink column projection, independent chains    (:104-190)
  4. nested sink specs 3 levels deep, all leaves equal (:192-252)
"""

import os

import pandas as pd
from pyspark.sql import functions as F

from embulk_filter_copy_spark.cdc.replayer import replay_stream
from embulk_filter_copy_spark.cdc.splitter import (
    SinkSpec,
    apply_transforms,
    flatten_specs,
    register_transform,
)
from embulk_filter_copy_spark.fixtures import (
    REPO_FILES_SCHEMA,
    gen_change_events,
    gen_repo_files,
    replay_oracle,
)
from embulk_filter_copy_spark.lake.table import LakeTable


def _mk_sink(spark, tmpdir_path, name, schema=None):
    path = os.path.join(tmpdir_path, name)
    LakeTable.create(spark, path, schema or REPO_FILES_SCHEMA,
                     key_columns=["repo", "path"], n_buckets=4)
    return path


def _final(spark, path):
    return (LakeTable.load(spark, path).read().toPandas()
            .sort_values(["repo", "path"]).reset_index(drop=True))


def test_flatten_nested_specs_composes_transforms():
    tree = SinkSpec(
        name="a", transforms=(("drop", ["lang"]),),
        children=(
            SinkSpec(name="b", path="/s/b", transforms=(("drop", ["commit"]),)),
            SinkSpec(name="c", path="/s/c"),
        ),
    )
    leaves = flatten_specs(tree)
    assert [l.name for l in leaves] == ["a/b", "a/c"]
    assert leaves[0].transforms == (("drop", ["lang"]), ("drop", ["commit"]))
    assert leaves[1].transforms == (("drop", ["lang"]),)


def test_copy_to_two_sinks_identical(spark, tmpdir_path):
    """Reference scenario 1: every sink receives every surviving record."""
    base = gen_repo_files(spark, 100, seed=2)
    ev = gen_change_events(spark, 100, 400, seed=2, dup_rate=0.05)
    s1 = _mk_sink(spark, tmpdir_path, "s1")
    s2 = _mk_sink(spark, tmpdir_path, "s2")
    for p in (s1, s2):
        LakeTable.load(spark, p).append(base.withColumn("_lsn", F.lit(0)))
    log = os.path.join(tmpdir_path, "log")
    ev.coalesce(1).write.parquet(log)
    specs = [SinkSpec(name="s1", path=s1), SinkSpec(name="s2", path=s2)]
    replay_stream(spark, log, specs, checkpoint=os.path.join(tmpdir_path, "ck"))
    golden = replay_oracle(base.toPandas(), ev.toPandas())
    f1, f2 = _final(spark, s1), _final(spark, s2)
    assert f1.equals(f2)
    assert f1[["repo", "path", "content"]].equals(
        golden[["repo", "path", "content"]].reset_index(drop=True))


def test_per_sink_projection_independent(spark, tmpdir_path):
    """Reference scenario 3: one sink drops columns, the other is full-width;
    chains are independent."""
    base = gen_repo_files(spark, 80, seed=4)
    ev = gen_change_events(spark, 80, 300, seed=4)
    narrow_schema = [("repo", "string"), ("path", "string"), ("content", "string")]
    s_full = _mk_sink(spark, tmpdir_path, "full")
    s_narrow = _mk_sink(spark, tmpdir_path, "narrow", schema=narrow_schema)
    for p, sch in ((s_full, None), (s_narrow, narrow_schema)):
        t = LakeTable.load(spark, p)
        cols = [c for c, _ in (sch or REPO_FILES_SCHEMA)]
        t.append(base.select(*cols).withColumn("_lsn", F.lit(0)))
    log = os.path.join(tmpdir_path, "log")
    ev.coalesce(1).write.parquet(log)
    specs = [
        SinkSpec(name="full", path=s_full),
        SinkSpec(name="narrow", path=s_narrow, transforms=(("drop", ["commit", "lang"]),)),
    ]
    replay_stream(spark, log, specs, checkpoint=os.path.join(tmpdir_path, "ck"))
    golden = replay_oracle(base.toPandas(), ev.toPandas())
    full, narrow = _final(spark, s_full), _final(spark, s_narrow)
    assert list(narrow.columns) == ["repo", "path", "content"]
    assert list(full.columns) == ["repo", "path", "commit", "lang", "content"]
    assert narrow.equals(golden[["repo", "path", "content"]].reset_index(drop=True))
    assert full.equals(golden.reset_index(drop=True))


def test_nested_specs_three_deep_all_leaves_equal(spark, tmpdir_path):
    """Reference scenario 4: nested copy 3 levels deep → all sinks identical."""
    base = gen_repo_files(spark, 60, seed=6)
    ev = gen_change_events(spark, 60, 200, seed=6)
    paths = {n: _mk_sink(spark, tmpdir_path, n) for n in ["l1", "l2", "l3a", "l3b"]}
    for p in paths.values():
        LakeTable.load(spark, p).append(base.withColumn("_lsn", F.lit(0)))
    tree = SinkSpec(
        name="root", path=paths["l1"],
        children=(
            SinkSpec(
                name="mid", path=paths["l2"],
                children=(
                    SinkSpec(name="leaf_a", path=paths["l3a"]),
                    SinkSpec(name="leaf_b", path=paths["l3b"]),
                ),
            ),
        ),
    )
    log = os.path.join(tmpdir_path, "log")
    ev.coalesce(1).write.parquet(log)
    replay_stream(spark, log, tree, checkpoint=os.path.join(tmpdir_path, "ck"))
    finals = [_final(spark, p) for p in paths.values()]
    for f in finals[1:]:
        assert f.equals(finals[0])
    assert len(finals[0]) == len(replay_oracle(base.toPandas(), ev.toPandas()))


def test_pandas_udf_transform_in_chain(spark, tmpdir_path):
    """Arrow-vectorized per-sink transform (input_hint: no per-row Python)."""

    @register_transform("content_upper_lang")
    def content_upper_lang(df):
        @F.pandas_udf("string")
        def upper(s: pd.Series) -> pd.Series:
            return s.str.upper()

        return df.withColumn("lang", upper(F.col("lang")))

    base = gen_repo_files(spark, 40, seed=8)
    ev = gen_change_events(spark, 40, 150, seed=8)
    s = _mk_sink(spark, tmpdir_path, "up")
    LakeTable.load(spark, s).append(
        base.withColumn("lang", F.upper("lang")).withColumn("_lsn", F.lit(0)))
    log = os.path.join(tmpdir_path, "log")
    ev.coalesce(1).write.parquet(log)
    spec = SinkSpec(name="up", path=s, transforms=(("pandas", "content_upper_lang"),))
    replay_stream(spark, log, spec, checkpoint=os.path.join(tmpdir_path, "ck"))
    golden = replay_oracle(base.toPandas(), ev.toPandas())
    got = _final(spark, s)
    assert (got["lang"].dropna() == golden["lang"].dropna().str.upper().values).all()
    assert got[["repo", "path", "content"]].equals(
        golden[["repo", "path", "content"]].reset_index(drop=True))


def test_mixed_filter_sink_forces_per_sink_dedup(spark, tmpdir_path):
    """A row-filter transform doesn't commute with LWW dedup, so its presence
    must disable the shared-dedup fast path for the WHOLE fan-out — each sink
    then matches the oracle over its own filtered event stream."""
    base = gen_repo_files(spark, 60, seed=12)
    ev = gen_change_events(spark, 60, 250, seed=12, dup_rate=0.1)
    s_full = _mk_sink(spark, tmpdir_path, "full")
    s_nodel = _mk_sink(spark, tmpdir_path, "nodel")
    for p in (s_full, s_nodel):
        LakeTable.load(spark, p).append(base.withColumn("_lsn", F.lit(0)))
    log = os.path.join(tmpdir_path, "log")
    ev.coalesce(1).write.parquet(log)
    specs = [
        SinkSpec(name="full", path=s_full),
        SinkSpec(name="nodel", path=s_nodel, transforms=(("filter", "op <> 'D'"),)),
    ]
    replay_stream(spark, log, specs, checkpoint=os.path.join(tmpdir_path, "ck"))
    ev_pdf = ev.toPandas()
    golden_full = replay_oracle(base.toPandas(), ev_pdf)
    golden_nodel = replay_oracle(base.toPandas(), ev_pdf[ev_pdf["op"] != "D"])
    cols = ["repo", "path", "content"]
    assert _final(spark, s_full)[cols].equals(golden_full[cols].reset_index(drop=True))
    assert _final(spark, s_nodel)[cols].equals(golden_nodel[cols].reset_index(drop=True))


def test_with_column_cannot_overwrite_protected(spark):
    """Overwriting a key or envelope column would corrupt replication (and
    the shared-dedup fast path's uniqueness guarantee) — must raise."""
    import pytest

    ev = gen_change_events(spark, 10, 20, seed=1)
    for col in ("repo", "path", "lsn", "op"):
        with pytest.raises(ValueError, match="protected"):
            apply_transforms(ev, (("with_column", col, "lower(repo)"),))
    # non-protected targets still fine
    out = apply_transforms(ev, (("with_column", "content", "upper(content)"),))
    assert "content" in out.columns


def test_shared_dedup_detection():
    from embulk_filter_copy_spark.cdc.replayer import FanoutApplier

    def applier(transform_sets, quarantine=None):
        leaves = [
            SinkSpec(name=f"s{i}", path=f"/s{i}", transforms=t)
            for i, t in enumerate(transform_sets)
        ]
        return FanoutApplier(None, leaves, "r", quarantine=quarantine)

    assert applier([(), (("drop", ["lang"]),)])._sharable_dedup()
    assert applier([(("with_column", "h", "sha2(content,256)"),)])._sharable_dedup()
    assert not applier([(), (("filter", "op <> 'D'"),)])._sharable_dedup()
    assert not applier([(("pandas", "anything"),)])._sharable_dedup()
    assert not applier([()], quarantine=("/q", 60))._sharable_dedup()


def test_filter_and_derived_column_transforms(spark, tmpdir_path):
    ev = gen_change_events(spark, 30, 100, seed=9)
    out = apply_transforms(
        ev,
        (
            ("filter", "op <> 'D'"),
            ("with_column", "content_sha", "sha2(content, 256)"),
            ("drop", ["commit"]),
        ),
    )
    assert "commit" not in out.columns and "content_sha" in out.columns
    assert out.filter("op = 'D'").count() == 0
    # envelope + keys survive any projection
    for c in ("lsn", "ts", "op", "repo", "path"):
        assert c in out.columns


def test_transforms_carry_patch_merge_info(spark):
    """Patch-mode merge info (_img_lsn/_del_lsn/_pl_*) must survive
    select/drop as machinery, follow a payload column through rename, and
    leave with its column on drop/projection — otherwise a transformed
    sink would silently lose the per-piece stale-duplicate guards."""
    from embulk_filter_copy_spark.cdc.splitter import apply_transforms

    df = spark.createDataFrame(
        [("k", 1, "P", "va", "vb", 1, None, 1, None)],
        "k string, lsn long, op string, a string, b string,"
        " _pl_a long, _pl_b long, _img_lsn long, _del_lsn long",
    )
    sel = apply_transforms(df, (("select", ["a"]),), keys=("k",))
    assert "a" in sel.columns and "_pl_a" in sel.columns
    assert "b" not in sel.columns and "_pl_b" not in sel.columns
    assert {"_img_lsn", "_del_lsn"} <= set(sel.columns)

    dropped = apply_transforms(df, (("drop", ["b"]),), keys=("k",))
    assert "b" not in dropped.columns and "_pl_b" not in dropped.columns
    assert "_pl_a" in dropped.columns

    ren = apply_transforms(df, (("rename", "a", "alpha"),), keys=("k",))
    assert "alpha" in ren.columns and "_pl_alpha" in ren.columns
    assert "a" not in ren.columns and "_pl_a" not in ren.columns
