"""Cross-engine-portable expression helpers — a LEAF module (no
package-internal imports), so operators and query modules can both depend
on it without creating an import cycle through the ``queries`` package
(whose ``__init__`` eagerly builds the full catalog).

The portable 60-bit hash is the determinism backbone shared by the
selection/dedup operators and every DuckDB oracle: both engines compute
``int(md5(x)[:15 hex], 16)`` so sampled/bucketed row sets replay
byte-identically anywhere.
"""

from __future__ import annotations

# Rounding of double aggregates for cross-engine comparison: floating sums
# land EXACTLY on decimal grid points (the data has 2-decimal grain), where
# Spark and DuckDB can fall on opposite sides of the half-up boundary after
# their (differently-ordered) summations. Shifting by 1e-9 moves the value
# off the boundary by far more than the ulp-level cross-engine difference,
# making the rounded result deterministic on BOTH engines.
ROUND_EPS = 1e-9


def reps(col, digits: int):
    from pyspark.sql import functions as F

    return F.round(col + F.lit(ROUND_EPS), digits)


def sql_reps(expr: str, digits: int) -> str:
    return f"round(({expr}) + 1e-9, {digits})"


# portable 60-bit hash computable identically in Spark and DuckDB:
#   Spark : conv(substr(md5(x), 1, 15), 16, 10) :: long
#   DuckDB: ('0x' || substr(md5(x), 1, 15)) :: BIGINT
def spark_phash(col_expr: str, salt: str = "") -> str:
    x = f"concat('{salt}', {col_expr})" if salt else col_expr
    return f"cast(conv(substr(md5({x}), 1, 15), 16, 10) as bigint)"


def duck_phash(col_expr: str, salt: str = "") -> str:
    x = f"('{salt}' || {col_expr})" if salt else col_expr
    return f"(('0x' || substr(md5({x}), 1, 15))::BIGINT)"
