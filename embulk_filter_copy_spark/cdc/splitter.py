"""Multi-sink fan-out splitter — the reference's core idea, Spark-first.

The reference physically re-copies every value of every row into N+1 page
builders (CopyColumnVisitor.scala:17-56) and runs each branch on its own
thread pool. Here the microbatch is persisted ONCE and each sink applies its
declarative transform chain to the cached plan — Catalyst reuses the cached
columnar batch, so "copying" costs nothing per sink beyond its own transform
+ merge work (SURVEY.md §2.2 "Per-record duplication").

Sink specs NEST like the reference's recursive copy-in-copy configs
(TestCopyFilterPlugin.scala:192-252, example/config.yml:24-28); they are
flattened at plan time into leaf sinks whose transform chain is the
composition of all ancestor chains — no nested streaming queries needed.

Transform chain grammar (declarative, JVM-side unless "pandas"):
    ("select", [cols...])          — keep only these payload columns
    ("drop", [cols...])            — remove payload columns
    ("filter", "sql expr")         — row predicate
    ("with_column", name, "expr")  — derived column (SQL expression)
    ("rename", old, new)           — payload column rename
    ("pandas", registry_name)      — Arrow-vectorized pandas UDF transform
                                     looked up in the transform registry

CDC envelope columns (lsn, ts, op, schema_change) and the key columns are
always preserved — they are the replication machinery, not payload.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ENVELOPE_COLS = ("lsn", "ts", "op", "schema_change")

# registry of named Arrow-vectorized transforms: name -> (DataFrame -> DataFrame)
TRANSFORM_REGISTRY: dict[str, object] = {}


def register_transform(name: str):
    def deco(fn):
        TRANSFORM_REGISTRY[name] = fn
        return fn

    return deco


@dataclass(frozen=True)
class SinkSpec:
    """A node in the fan-out tree. Leaf iff ``path`` is set (a LakeTable
    root); interior nodes contribute their transforms to every descendant.

    ``mode`` (leaf-only): ``"merge"`` upserts final state per key (the
    default), ``"history"`` appends every version to an SCD2 version store
    (`cdc/history.py`) — one stream can feed the current-state table AND
    its audit history in the same epoch, each exactly-once under its own
    manifest."""

    name: str
    path: str | None = None
    transforms: tuple = ()
    children: tuple = ()
    mode: str = "merge"


@dataclass(frozen=True)
class LeafSink:
    name: str
    path: str
    transforms: tuple = ()
    mode: str = "merge"


def flatten_specs(
    specs: list[SinkSpec] | SinkSpec,
    _prefix: str = "",
    _chain: tuple = (),
    _mode: str = "merge",
) -> list[LeafSink]:
    """Flatten a nested sink tree into leaf sinks with composed transforms —
    parity with the reference's nested-copy flattening semantics. ``mode``
    follows the same inheritance rule as transforms: an interior node's
    non-default mode becomes the default for every descendant (a leaf's own
    non-default mode still wins), and an unknown mode raises on ANY node,
    not just leaves."""
    if isinstance(specs, SinkSpec):
        specs = [specs]
    leaves: list[LeafSink] = []
    for s in specs:
        name = f"{_prefix}{s.name}"
        if s.mode not in ("merge", "history"):
            raise ValueError(f"unknown sink mode {s.mode!r} on {name!r}")
        chain = _chain + tuple(s.transforms)
        mode = s.mode if s.mode != "merge" else _mode
        if s.path is not None:
            leaves.append(
                LeafSink(name=name, path=s.path, transforms=chain, mode=mode)
            )
        for c in s.children:
            leaves.extend(
                flatten_specs(c, _prefix=f"{name}/", _chain=chain, _mode=mode)
            )
    return leaves


def _protected(df: DataFrame, keys: tuple[str, ...]) -> set[str]:
    # _img_lsn/_del_lsn/_pl_* are patch-fold merge info (per-piece LSNs the
    # merge guards stale duplicates with) — machinery, not payload
    info = {
        c for c in df.columns
        if c in ("_img_lsn", "_del_lsn") or c.startswith("_pl_")
    }
    return {c for c in ENVELOPE_COLS if c in df.columns} | set(keys) | info


def apply_transforms(
    df: DataFrame, transforms: tuple, keys: tuple[str, ...] = ("repo", "path")
) -> DataFrame:
    for t in transforms:
        kind = t[0]
        prot = _protected(df, keys)
        if kind == "select":
            want = set(t[1]) | prot
            # a projected-out payload column takes its _pl_ guard with it
            keep = [
                c for c in df.columns
                if c in want
                and not (c.startswith("_pl_") and c[len("_pl_"):] not in want)
            ]
            df = df.select(*keep)
        elif kind == "drop":
            drops = [c for c in t[1] if c not in prot]
            drops += [f"_pl_{c}" for c in drops if f"_pl_{c}" in df.columns]
            df = df.drop(*drops)
        elif kind == "filter":
            df = df.filter(t[1])
        elif kind == "with_column":
            if t[1] in prot:
                # overwriting a key or envelope column would corrupt the
                # replication machinery (and break the shared-dedup fast
                # path's per-key-uniqueness guarantee)
                raise ValueError(f"cannot overwrite protected column {t[1]!r}")
            df = df.withColumn(t[1], F.expr(t[2]))
        elif kind == "rename":
            if t[1] in prot:
                raise ValueError(f"cannot rename protected column {t[1]!r}")
            df = df.withColumnRenamed(t[1], t[2])
            if f"_pl_{t[1]}" in df.columns:  # patch guard follows its column
                df = df.withColumnRenamed(f"_pl_{t[1]}", f"_pl_{t[2]}")
        elif kind == "pandas":
            fn = TRANSFORM_REGISTRY[t[1]]
            df = fn(df)
        else:
            raise ValueError(f"unknown transform {t!r}")
    return df
