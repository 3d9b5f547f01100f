"""Tiny inline fixtures as JVM LocalRelations.

``spark.createDataFrame(python_list)`` parallelizes the rows into an
RDD, so every action that touches the fixture spins up a Python
runner per partition — measured at ~4 s per action on local[32] even
for a 5-row dim. ``values_df`` renders the same rows as a
``SELECT ... FROM VALUES`` statement instead: Catalyst folds that to
a LocalRelation that lives entirely JVM-side, joins/broadcasts for
free, and costs microseconds. Use it for every deterministic
in-query fixture in the catalogs.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession


def _sql_literal(v) -> str:
    """Render one Python value as a Spark SQL literal (pre-CAST)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    # datetime before date: datetime is a date subclass
    if isinstance(v, datetime.datetime):
        return "'" + v.strftime("%Y-%m-%d %H:%M:%S.%f") + "'"
    if isinstance(v, datetime.date):
        return "'" + v.isoformat() + "'"
    if isinstance(v, str):
        # '' doubling for quotes; backslash doubled because the
        # default parser treats \ as an escape character
        return "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "array(" + ", ".join(_sql_literal(x) for x in v) + ")"
    raise TypeError(f"values_df cannot render {type(v).__name__}: {v!r}")


def values_df(spark: SparkSession, schema: str, rows) -> DataFrame:
    """Build a DataFrame from ``rows`` (tuples) and a createDataFrame
    style schema string (``"name: type, name: type"``) as a pure-JVM
    LocalRelation.

    Every column is CAST to its declared type in the SELECT, so
    literal typing quirks (bare ``0.3`` parsing as DECIMAL, ints as
    INT rather than BIGINT) never leak into the result schema.
    """
    cols = [tuple(p.strip() for p in c.split(":", 1)) for c in schema.split(",")]
    if not rows:
        raise ValueError("values_df needs at least one row; for empty "
                         "fixtures build an explicit empty DataFrame")
    width = len(cols)
    names = [name for name, _ in cols]
    rows = [
        tuple(r[n] for n in names) if isinstance(r, dict) else tuple(r)
        for r in rows
    ]
    for r in rows:
        if len(r) != width:
            raise ValueError(f"row {r!r} has {len(r)} values, schema has {width}")
    slots = [f"c{i}" for i in range(width)]
    select = ", ".join(
        f"CAST({slot} AS {typ}) AS `{name}`"
        for slot, (name, typ) in zip(slots, cols)
    )
    values = ", ".join(
        "(" + ", ".join(_sql_literal(v) for v in r) + ")" for r in rows
    )
    return spark.sql(
        f"SELECT {select} FROM VALUES {values} AS t({', '.join(slots)})"
    )
