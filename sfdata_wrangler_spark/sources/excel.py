"""Excel-matrix sources (SURVEY.md S4).

The reference ingests three spreadsheet shapes (driver-side pandas,
then append to the store):

- BART station-to-station ridership matrices with a DYNAMIC footer:
  the sheet has one row per origin station, an ``Exits`` total column
  marking the matrix width, and a variable number of trailing footnote
  rows (``MultiModalHelper.py:381-387``). The footer size is inferred
  from the ``Exits`` marker, never hardcoded.
- BLS CPI tables: Year x (Jan..Dec, HALF1, HALF2) matrix; the 2010
  HALF1 cell is the deflator base (``DemandHelper.py:1528-1556``).
- EIA fuel-price series: monthly prices stamped mid-month, normalized
  to month start and deflated by the CPI factor
  (``DemandHelper.py:1370-1400``).

These are small dimension tables (hundreds of rows) even against a
100 TB fact side, so the parse is driver-side pandas followed by
``spark.createDataFrame`` — the correct scale shape is "broadcast
dim", not "distributed scan". The grid->table normalization logic is
pure-pandas and engine-agnostic: it accepts any parsed sheet grid, so
tests (and containers without xlrd/openpyxl) can feed CSV-exported
fixtures through the identical code path.
"""

from __future__ import annotations

import datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def read_sheet_grid(
    path: str,
    sheet: int | str = 0,
    header: int = 0,
    index_col: int | None = 0,
    skiprows: int | None = None,
) -> pd.DataFrame:
    """Parse one sheet into a raw grid. ``.csv`` paths (exported
    fixtures) go through pandas; ``.xlsx`` parses for REAL via the
    stdlib SpreadsheetML codec (:mod:`.xlsx` — zipfile + ElementTree,
    no openpyxl needed); legacy binary ``.xls`` still needs xlrd."""
    if path.endswith(".csv"):
        return pd.read_csv(
            path, header=header, index_col=index_col, skiprows=skiprows
        )
    if path.endswith(".xlsx"):
        from .xlsx import read_xlsx_grid

        return read_xlsx_grid(
            path,
            sheet=sheet,
            header=header,
            index_col=index_col,
            skiprows=skiprows,
        )
    try:
        return pd.read_excel(
            path,
            sheet_name=sheet,
            header=header,
            index_col=index_col,
            skiprows=skiprows,
        )
    except ImportError as e:  # no xlrd in this environment
        raise ImportError(
            "no legacy .xls engine available; convert to .xlsx (stdlib "
            f"codec) or export to CSV ({e})"
        ) from e


def bart_matrix_to_long(
    grid: pd.DataFrame, month: datetime.date
) -> pd.DataFrame:
    """BART weekday matrix -> long (FROM, TO, RIDERS, MONTH, STATIONS).

    Footer detection per ``MultiModalHelper.py:381-387``: the matrix
    is square with one column per destination station followed by an
    ``Exits`` total column, so ``num_stations = columns.index('Exits')``
    and everything past row ``num_stations + 1`` is footnote junk of
    arbitrary length. The reference's bounds are inclusive of the
    totals row/column (old ``parse_cols`` semantics); we keep them
    faithfully and stack drops empty cells."""
    cols = list(grid.columns)
    if "Exits" not in cols:
        raise ValueError("not a BART matrix sheet: no 'Exits' marker column")
    num_stations = cols.index("Exits")
    footer_rows = len(grid) - num_stations - 1
    if footer_rows < 0:
        raise ValueError(
            f"matrix has {len(grid)} rows but {num_stations} stations; "
            "footer underflow — wrong header offset?"
        )
    kept = grid.iloc[: num_stations + 1, : num_stations + 1]
    long = kept.stack().reset_index()
    long.columns = ["FROM", "TO", "RIDERS"]
    long["FROM"] = long["FROM"].apply(str)
    long["TO"] = long["TO"].apply(str)
    long["RIDERS"] = long["RIDERS"].astype(float)
    long["MONTH"] = pd.Timestamp(month)
    long["STATIONS"] = num_stations
    return long


def cpi_factors(grid: pd.DataFrame, base_year: int = 2010) -> pd.DataFrame:
    """BLS CPI matrix -> (MONTH, CPI, CPI_FACTOR) with
    ``CPI_FACTOR = CPI[base_year HALF1] / CPI`` (``DemandHelper.py:
    1528-1556``). HALF1/HALF2 are annual summary columns, used only
    for the base, then dropped before the monthly stack."""
    base = float(grid.at[base_year, "HALF1"])
    monthly = grid.drop(["HALF1", "HALF2"], axis=1)
    long = monthly.stack().reset_index()
    long.columns = ["Year", "monthString", "CPI"]
    long["MONTH"] = pd.to_datetime(
        "01-" + long["monthString"].astype(str) + "-"
        + long["Year"].astype(int).astype(str),
        format="%d-%b-%Y",
    )
    long["CPI"] = long["CPI"].astype(float)
    long["CPI_FACTOR"] = base / long["CPI"]
    return long[["MONTH", "CPI", "CPI_FACTOR"]]


def fuel_prices(
    grid: pd.DataFrame,
    cpi: pd.DataFrame,
    price_col: str = (
        "San Francisco All Grades All Formulations Retail Gasoline "
        "Prices (Dollars per Gallon)"
    ),
) -> pd.DataFrame:
    """EIA fuel series -> (MONTH, FUEL_PRICE, FUEL_PRICE_2010USD, CPI)
    (``DemandHelper.py:1370-1400``). EIA stamps each month's price on
    the 15th; subtracting 14 days normalizes to the month start so the
    CPI join keys align."""
    df = grid.reset_index() if "Date" not in grid.columns else grid.copy()
    df = df.rename(columns={"Date": "MONTH", price_col: "FUEL_PRICE"})
    df = df[["MONTH", "FUEL_PRICE"]]
    df["MONTH"] = pd.to_datetime(df["MONTH"]) - pd.Timedelta(days=14)
    df = df.merge(cpi, how="left", on="MONTH", sort=True)
    df["FUEL_PRICE_2010USD"] = df["FUEL_PRICE"] * df["CPI_FACTOR"]
    return df[["MONTH", "FUEL_PRICE", "FUEL_PRICE_2010USD", "CPI"]]


def bart_weekday_frame(
    spark: SparkSession,
    sheets: list[tuple[pd.DataFrame, datetime.date]],
) -> DataFrame:
    """Stack many monthly BART matrices into one Spark DataFrame — the
    reference's directory loop (``MultiModalHelper.py:370-407``) with
    the HDF5 append replaced by a broadcastable in-memory dim."""
    frames = [bart_matrix_to_long(g, m) for g, m in sheets]
    return spark.createDataFrame(pd.concat(frames, ignore_index=True))


def fuel_price_frame(
    spark: SparkSession, fuel_grid: pd.DataFrame, cpi_grid: pd.DataFrame
) -> DataFrame:
    return spark.createDataFrame(fuel_prices(fuel_grid, cpi_factors(cpi_grid)))
