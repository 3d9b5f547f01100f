"""Excel-matrix source logic (S4) against CSV-exported fixtures —
the container has no Excel engine, so the grid->table normalization
(footer detection, CPI stack, fuel-price month alignment) is exercised
through the same code path an .xlsx would take after parsing."""

import datetime

import numpy as np
import pandas as pd
import pytest

from sfdata_wrangler_spark.sources.excel import (
    bart_matrix_to_long,
    bart_weekday_frame,
    cpi_factors,
    fuel_price_frame,
    fuel_prices,
    read_sheet_grid,
)

STATIONS = ["RM", "EN", "EP"]


def _bart_grid(footer_rows: int) -> pd.DataFrame:
    """Sheet grid as parsed with header applied and index_col=0:
    3x3 station matrix + Exits total column + Entries total row +
    a dynamic number of footnote rows."""
    data = {
        "RM": [10.0, 20.0, 30.0, 60.0],
        "EN": [1.0, 2.0, 3.0, 6.0],
        "EP": [4.0, 5.0, 6.0, 15.0],
        "Exits": [15.0, 27.0, 39.0, 81.0],
        "Extra": [np.nan] * 4,  # junk column right of the matrix
    }
    grid = pd.DataFrame(data, index=STATIONS + ["Entries"])
    for i in range(footer_rows):
        grid.loc[f"Note {i}: source BART"] = np.nan
    return grid


@pytest.mark.parametrize("footer_rows", [0, 2, 5])
def test_bart_footer_detection(footer_rows):
    month = datetime.date(2013, 4, 1)
    long = bart_matrix_to_long(_bart_grid(footer_rows), month)
    # footer rows and the junk column never leak into the long form
    assert not long["FROM"].str.startswith("Note").any()
    assert "Extra" not in set(long["TO"])
    assert (long["STATIONS"] == 3).all()
    # (3 stations + Entries row) x (3 stations + Exits col), no NaNs
    assert len(long) == 16
    got = long.set_index(["FROM", "TO"])["RIDERS"]
    assert got[("RM", "EN")] == 1.0
    assert got[("EN", "EP")] == 5.0
    assert got[("Entries", "Exits")] == 81.0
    assert (long["MONTH"] == pd.Timestamp(month)).all()


def test_bart_matrix_requires_marker():
    grid = _bart_grid(1).drop(columns=["Exits"])
    with pytest.raises(ValueError, match="Exits"):
        bart_matrix_to_long(grid, datetime.date(2013, 4, 1))


def test_bart_csv_roundtrip(tmp_path, spark):
    """CSV-exported sheet goes through read_sheet_grid to the same
    long form, and stacks into a Spark frame."""
    p = tmp_path / "bart_2013_April.csv"
    _bart_grid(3).to_csv(p)
    grid = read_sheet_grid(str(p), header=0, index_col=0)
    long = bart_matrix_to_long(grid, datetime.date(2013, 4, 1))
    assert len(long) == 16
    sdf = bart_weekday_frame(
        spark,
        [
            (grid, datetime.date(2013, 4, 1)),
            (_bart_grid(0), datetime.date(2013, 5, 1)),
        ],
    )
    assert sdf.count() == 32
    assert {"FROM", "TO", "RIDERS", "MONTH", "STATIONS"} <= set(sdf.columns)


def _cpi_grid() -> pd.DataFrame:
    months = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
              "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
    rows = {}
    for year, base in ((2009, 210.0), (2010, 218.0), (2011, 224.0)):
        rows[year] = [base + i * 0.5 for i in range(12)] + [
            base + 1.0,  # HALF1
            base + 4.0,  # HALF2
        ]
    return pd.DataFrame.from_dict(
        rows, orient="index", columns=months + ["HALF1", "HALF2"]
    )


def test_cpi_factors_base_and_stack():
    out = cpi_factors(_cpi_grid())
    assert len(out) == 36
    assert {"MONTH", "CPI", "CPI_FACTOR"} == set(out.columns)
    base = 219.0  # 2010 HALF1
    jan2010 = out[out.MONTH == pd.Timestamp("2010-01-01")].iloc[0]
    assert jan2010.CPI == 218.0
    assert jan2010.CPI_FACTOR == base / 218.0
    # deflating a 2009 dollar inflates it toward 2010
    dec2009 = out[out.MONTH == pd.Timestamp("2009-12-01")].iloc[0]
    assert dec2009.CPI_FACTOR == base / 215.5


def test_fuel_prices_midmonth_normalization(spark):
    fuel = pd.DataFrame(
        {
            "Date": [pd.Timestamp("2010-01-15"), pd.Timestamp("2010-02-15")],
            "San Francisco All Grades All Formulations Retail Gasoline "
            "Prices (Dollars per Gallon)": [3.0, 3.5],
        }
    )
    out = fuel_prices(fuel, cpi_factors(_cpi_grid()))
    assert list(out.MONTH) == [
        pd.Timestamp("2010-01-01"),
        pd.Timestamp("2010-02-01"),
    ]
    jan_factor = 219.0 / 218.0
    assert np.isclose(out.FUEL_PRICE_2010USD.iloc[0], 3.0 * jan_factor)
    sdf = fuel_price_frame(spark, fuel, _cpi_grid())
    assert sdf.count() == 2
    assert {"MONTH", "FUEL_PRICE", "FUEL_PRICE_2010USD", "CPI"} <= set(
        sdf.columns
    )


def test_real_xlsx_roundtrip_and_bart_parse(tmp_path):
    """The stdlib .xlsx codec: write a genuine workbook (zip +
    SpreadsheetML), read it back, and check it parses identically to
    the same grid fed through the CSV path."""
    import datetime

    from sfdata_wrangler_spark.sources.excel import (
        bart_matrix_to_long,
        read_sheet_grid,
    )
    from sfdata_wrangler_spark.sources.xlsx import write_xlsx

    grid_rows = [
        [None, "A", "B", "Exits"],
        ["A", 1.0, 2.0, 3.0],
        ["B", 4.0, 5.5, 9.5],
        ["Entries", 5.0, 7.5, 12.5],
        ["Note: junk footer", None, None, None],
    ]
    xlsx_path = str(tmp_path / "m.xlsx")
    write_xlsx(xlsx_path, {"Sheet1": grid_rows})
    csv_path = str(tmp_path / "m.csv")
    with open(csv_path, "w") as f:
        for row in grid_rows:
            f.write(",".join("" if v is None else str(v) for v in row) + "\n")

    from_xlsx = read_sheet_grid(xlsx_path, sheet=0)
    from_csv = read_sheet_grid(csv_path)
    month = datetime.date(2013, 4, 1)
    lx = bart_matrix_to_long(from_xlsx, month).sort_values(["FROM", "TO"])
    lc = bart_matrix_to_long(from_csv, month).sort_values(["FROM", "TO"])
    pd.testing.assert_frame_equal(
        lx.reset_index(drop=True), lc.reset_index(drop=True)
    )
    assert lx.RIDERS.sum() == 50.0


def test_real_xlsx_committed_fixture_and_sheet_names():
    """The committed bart_od.xlsx fixture parses with real zip magic,
    sheet selection by index and by name, and mixed types."""
    import os

    from sfdata_wrangler_spark.sources.excel import read_sheet_grid
    from sfdata_wrangler_spark.sources.xlsx import read_xlsx_grid

    path = os.path.join(os.path.dirname(__file__), "fixtures", "bart_od.xlsx")
    with open(path, "rb") as f:
        assert f.read(2) == b"PK"  # genuine zip container
    bart = read_sheet_grid(path, sheet=0)
    assert list(bart.columns) == ["S1", "S2", "S3", "Exits"]
    assert bart.at["S2", "S3"] == 23.0
    cpi = read_xlsx_grid(path, sheet="CPI")
    assert cpi.at[2010, "HALF1"] == 218.0
    assert cpi.at[2011, "Dec"] == 226.5


def test_system_report_sink_roundtrip(spark):
    """S10 report sink: Values layout + Differences formulas write as
    a genuine workbook; the inverse reader recovers every value; the
    Differences sheet holds real <f> formula cells."""
    import zipfile

    from sfdata_wrangler_spark.sources.report_xlsx import (
        read_system_report,
        write_system_report,
    )

    panel = spark.createDataFrame(
        [
            {"month": "1995-01-01", "n_customers": 10.0, "n_orders": 20.0,
             "n_items": 80.0, "revenue": 1234.56, "quantity": 400.0},
            {"month": "1995-02-01", "n_customers": 12.0, "n_orders": 25.0,
             "n_items": 90.0, "revenue": 2234.56, "quantity": 410.0},
            {"month": "1995-03-01", "n_customers": 9.0, "n_orders": 18.0,
             "n_items": 70.0, "revenue": 1034.26, "quantity": 380.0},
        ]
    )
    path = "/tmp/sfdata_test_report.xlsx"
    months = write_system_report(panel, path)
    assert months == ["1995-01-01", "1995-02-01", "1995-03-01"]

    rows = read_system_report(path)
    by = {(r["metric"], r["month"]): r["value"] for r in rows}
    assert by[("Revenue", "1995-02-01")] == 2234.56
    assert by[("Customers", "1995-03-01")] == 9.0
    assert {r["section"] for r in rows} == {
        "Drivers of Demand", "Service Provided", "Ridership"
    }
    assert len(rows) == 5 * 3  # 5 metrics x 3 months

    # the Differences sheet carries genuine formula cells
    with zipfile.ZipFile(path) as zf:
        sheet2 = zf.read("xl/worksheets/sheet2.xml").decode()
    assert "<f>Values!F5-Values!E5</f>" in sheet2  # first metric row
