"""Derived-metric column functions (SURVEY.md §2.8 F9–F11).

All pure Column expressions (whole-stage-codegen'd): performance
ratios, guarded speeds, schedule-deviation, on-time windows, CPI
deflation. The reference computes these with row-wise ``np.where`` /
``Series.apply`` (``SFMuniDataExpander.py:66-97,550-590``,
``DemandHelper.py:1528-1556``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_round(col: Column | str, scale: int = 2) -> Column:
    """Half-up rounding computed in plain float arithmetic:
    ``floor(x·10^s + 0.5) / 10^s``.

    Spark's ``F.round`` rounds the double's SHORTEST decimal
    representation (``BigDecimal.valueOf``) while DuckDB/numpy round
    the true binary value — they disagree on values like 33661.465.
    This form uses only IEEE ops (multiply, add, floor, divide) that
    every engine computes bit-identically, which the DuckDB-oracle
    differential tests rely on.
    """
    if isinstance(col, str):
        col = F.col(col)
    f = float(10**scale)
    return F.floor(col * f + 0.5) / f


def sql_portable_round(sql: str) -> str:
    """Rewrite every ``round(expr, n)`` in an ANSI-SQL string to the
    floor form above, so the oracle computes literally the same float
    ops as the Spark plan. Handles nested parens/commas."""
    out = []
    i = 0
    n = len(sql)
    while i < n:
        j = sql.find("round(", i)
        # only rewrite standalone round( (not e.g. "around(")
        while j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
            j = sql.find("round(", j + 1)
        if j == -1:
            out.append(sql[i:])
            break
        out.append(sql[i:j])
        depth = 0
        k = j + len("round(")
        start = k
        last_comma = -1
        while k < n:
            ch = sql[k]
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    break
                depth -= 1
            elif ch == "," and depth == 0:
                last_comma = k
            k += 1
        expr = sql[start:last_comma].strip()
        scale = int(sql[last_comma + 1 : k].strip())
        factor = f"{10.0**scale:.1f}"
        out.append(f"(floor(({expr}) * {factor} + 0.5) / {factor})")
        i = k + 1
    return "".join(out)


def safe_ratio(num: Column, den: Column, scale: int = 2) -> Column:
    """num/den with zero/null denominator → 0.0 (the reference's
    guarded-speed convention, ``SFMuniDataAggregator.py:1257-1270``)."""
    return F.when(den > 0, portable_round(num / den, scale)).otherwise(F.lit(0.0))


def speed(miles: Column, minutes: Column) -> Column:
    """mph = miles / (minutes/60), 0 when minutes <= 0
    (``SFMuniDataExpander.py:66-79``)."""
    return safe_ratio(miles, minutes / 60.0)


def signed_deviation_minutes(observed_ts: Column, scheduled_ts: Column) -> Column:
    """Signed schedule deviation in minutes, rounded to 2
    (``SFMuniDataExpander.py:82-97``)."""
    return F.round(
        (F.unix_timestamp(observed_ts) - F.unix_timestamp(scheduled_ts)) / 60.0, 2
    )


def ontime5(dep_dev: Column, arr_dev: Column, observed: Column) -> Column:
    """TCRP-165 on-time flag: departed no more than 1 min early AND
    arrived less than 5 min late; null when unobserved
    (``SFMuniDataExpander.py:550-551``)."""
    flag = F.when((dep_dev > -1) & (arr_dev < 5), 1).otherwise(0)
    return F.when(observed == 1, flag).otherwise(F.lit(None))


def cpi_factor(cpi: Column, base_cpi: Column) -> Column:
    """Deflation factor to constant dollars: base/current
    (``DemandHelper.py:1528-1556``)."""
    return base_cpi / cpi
