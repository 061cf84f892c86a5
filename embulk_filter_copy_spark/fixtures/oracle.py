"""Single-threaded pandas golden replayer (FIXTURES.md F3).

Applies the change event log to the base snapshot in STRICT LSN order with
last-writer-wins — the semantic ground truth the distributed engine must
match row-for-row via sha256(content) equality (BASELINE.json input_hint).
Deliberately naive and order-dependent: no batching, no merge tricks, so it
cannot share a bug with the engine.
"""

from __future__ import annotations

import hashlib
import json

import pandas as pd

_WIDEN_CAST = {"long": "Int64", "double": "float64", "int": "Int64"}


def replay_oracle(base_pdf: pd.DataFrame, events_pdf: pd.DataFrame) -> pd.DataFrame:
    """Replay events over the base table; returns the golden final table.

    * events applied in ascending lsn order; duplicate lsns applied once,
    * op I/U: row image replaces state for (repo, path),
    * op D: row removed,
    * op S: schema change (add/rename/widen) applied to all rows.
    """
    columns = list(base_pdf.columns)
    state: dict[tuple, dict] = {}
    for row in base_pdf.itertuples(index=False):
        d = dict(zip(columns, row))
        state[(d["repo"], d["path"])] = d

    ev = events_pdf.sort_values("lsn", kind="stable")
    ev = ev.drop_duplicates(subset=["lsn"], keep="first")

    for row in ev.itertuples(index=False):
        e = dict(zip(ev.columns, row))
        op = e["op"]
        if op == "S":
            change = json.loads(e["schema_change"])
            action = change["action"]
            if action == "add":
                col = change["column"]
                if col not in columns:
                    columns.append(col)
                    for d in state.values():
                        d[col] = None
            elif action == "rename":
                src, dst = change["from"], change["to"]
                columns[columns.index(src)] = dst
                for d in state.values():
                    d[dst] = d.pop(src)
            elif action == "widen":
                pass  # value-preserving; cast applied when materializing
            elif action == "drop":
                col = change["column"]
                if col in columns:
                    columns.remove(col)
                    for d in state.values():
                        d.pop(col, None)
            else:
                raise ValueError(f"unknown schema action {action!r}")
            continue
        key = (e["repo"], e["path"])
        if op == "D":
            state.pop(key, None)
        elif op in ("I", "U"):
            img = {c: None for c in columns}
            for c in ("repo", "path", "commit", "lang", "content"):
                if c in columns:
                    img[c] = e.get(c)
            state[key] = img
        else:
            raise ValueError(f"unknown op {op!r}")

    if not state:
        return pd.DataFrame(columns=columns)
    out = pd.DataFrame([{c: d.get(c) for c in columns} for d in state.values()], columns=columns)
    return out.sort_values(["repo", "path"], kind="stable").reset_index(drop=True)


def table_digest_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-key sha256(content) — the cross-implementation invariant."""

    def h(x):
        return None if x is None or (isinstance(x, float) and pd.isna(x)) else hashlib.sha256(
            str(x).encode()
        ).hexdigest()

    out = pdf[["repo", "path"]].copy()
    out["content_sha"] = pdf["content"].map(h)
    return out.sort_values(["repo", "path"], kind="stable").reset_index(drop=True)
