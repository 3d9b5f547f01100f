"""Excel report sink (SURVEY.md S10, ref ``TransitReporter.py``).

The reference writes xlsxwriter workbooks: labeled metric sections
down the sheet, months across the columns
(``writeSystemValues``, TransitReporter.py:459-634), plus sheets of
month-over-month difference formulas (``:637-941``). This module
re-expresses that sink on the stdlib SpreadsheetML writer
(:mod:`.xlsx` — no xlsxwriter):

- the monthly panel is computed IN SPARK (one aggregation over the
  fact table) and only the final months × metrics grid (hundreds of
  cells) is collected for layout — the correct scale split between
  cluster work and driver-side presentation;
- the Values sheet mirrors the reference's layout: section title rows,
  metric labels, months across columns;
- the Differences sheet holds REAL Excel formulas
  (``Values!E14-Values!D14`` …) that spreadsheet apps calculate on
  open — the reference's ``writeSystemDifferenceFormulas`` semantic;
- xlsxwriter sparklines have no SpreadsheetML-core equivalent (they
  are an x14 extension), so the Trend column carries an inline
  text micro-chart (block glyphs scaled per row) — same at-a-glance
  purpose, plain cells.

``read_system_report`` inverse-maps the layout back to a long
(section, metric, month, value) frame, which makes the sink
round-trippable and therefore oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .xlsx import Formula, _col_letters, read_xlsx_raw, write_xlsx

#: (section, [(label, metric column)]) — layout rows in order.
SYSTEM_SECTIONS = [
    ("Drivers of Demand", [("Customers", "n_customers")]),
    (
        "Service Provided",
        [("Orders", "n_orders"), ("Line Items", "n_items")],
    ),
    (
        "Ridership",
        [("Revenue", "revenue"), ("Quantity", "quantity")],
    ),
]

_VALUES_START_COL = 4  # first month column (after label + trend cols)
_HEADER_ROW = 2  # months header
_FIRST_DATA_ROW = 3


def _spark_glyph_row(values: list[float]) -> str:
    """Inline text sparkline: one block glyph per month, scaled to the
    row's own min..max (the trend shape, not the magnitude)."""
    blocks = "▁▂▃▄▅▆▇█"
    nums = [v for v in values if v is not None]
    if not nums:
        return ""
    lo, hi = min(nums), max(nums)
    span = (hi - lo) or 1.0
    return "".join(
        " " if v is None else blocks[int((v - lo) / span * (len(blocks) - 1))]
        for v in values
    )


def system_report_grids(
    panel: list[dict], months: list[str]
) -> dict[str, list[list]]:
    """Panel rows ({month: ..., metric columns...}) → the two report
    sheets as raw grids for :func:`sources.xlsx.write_xlsx`."""
    by_month = {r["month"]: r for r in panel}
    header = [None, None, "Metric", "Trend"] + list(months)
    values: list[list] = [
        ["System Performance Report"],
        [],
        header,
    ]
    diffs: list[list] = [
        ["Month-over-month differences (calculated formulas)"],
        [],
        header,
    ]
    r = _FIRST_DATA_ROW
    for section, metrics in SYSTEM_SECTIONS:
        values.append([None, section])
        diffs.append([None, section])
        r += 1
        for label, key in metrics:
            vals = [
                (by_month[m][key] if m in by_month else None) for m in months
            ]
            values.append(
                [None, None, label, _spark_glyph_row(vals)] + vals
            )
            # real formulas: this month minus last month on the Values
            # sheet (first month has no predecessor)
            frow = [None, None, label, None, None]
            for ci in range(1, len(months)):
                cur = f"{_col_letters(_VALUES_START_COL + ci)}{r + 1}"
                prev = f"{_col_letters(_VALUES_START_COL + ci - 1)}{r + 1}"
                frow.append(Formula(f"Values!{cur}-Values!{prev}"))
            diffs.append(frow)
            r += 1
    return {"Values": values, "Differences": diffs}


def write_system_report(
    panel_df: DataFrame, path: str, month_col: str = "month"
) -> list[str]:
    """Spark monthly panel → .xlsx report. Collects ONLY the final
    grid (months × ~6 metrics). Returns the month order written."""
    rows = [r.asDict() for r in panel_df.collect()]
    months = sorted({r[month_col] for r in rows})
    write_xlsx(path, system_report_grids(rows, months))
    return months


def read_system_report(path: str) -> list[dict]:
    """Inverse of the layout: Values sheet → long
    (section, metric, month, value) dicts — the round-trip used by the
    oracle-checked sink query."""
    grid = read_xlsx_raw(path, sheet="Values")
    header = grid[_HEADER_ROW]
    months = [m for m in header[_VALUES_START_COL:] if m is not None]
    out = []
    section = None
    for row in grid[_FIRST_DATA_ROW:]:
        if len(row) > 1 and row[1] is not None:
            section = row[1]
            continue
        if len(row) <= 2 or row[2] is None:
            continue
        label = row[2]
        for ci, month in enumerate(months):
            idx = _VALUES_START_COL + ci
            val = row[idx] if idx < len(row) else None
            if val is not None:
                out.append(
                    {
                        "section": section,
                        "metric": label,
                        "month": month,
                        "value": float(val),
                    }
                )
    return out
