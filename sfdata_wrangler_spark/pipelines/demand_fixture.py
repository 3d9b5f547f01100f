"""Committed demand-ingest fixture: mini ACS/LODES/QCEW/CPI-shaped CSVs.

The reference's demand tier reads ~10 dataset-specific government file
formats (``DemandHelper.py:518-1330``). ``pipe_demand`` models the
OPERATOR composition on synthetic tables; this module adds
DATASET-level fidelity: real files in the reference's column layouts
(wide census estimate years, the post-2010 ``Population Estimate (as
of July 1) - YYYY`` headers behind a title row, LODES
``h_geocode``/``C000``, the block→county crosswalk, QCEW quarterly
``month{1,2,3}_emplvl`` columns, BLS CPI ``Year, Jan..Dec, HALF1``)
are parsed by the actual ingest code and driven end-to-end.

Every value is a CLOSED-FORM integer (CPI half-year means end in .5,
exactly representable), so the DuckDB oracle can restate the whole
composition without reading files, and a unit test can regenerate the
committed CSVs byte-for-byte (drift guard).

Counties: 06001 (c=0) and 06075 (c=1). Years 2008-2012.
"""

from __future__ import annotations

import os

COUNTIES = [("06001", 0), ("06075", 1)]
YEARS = list(range(2008, 2013))  # 2008..2012
CPI_YEARS = list(range(2007, 2014))
N_BLOCKS = 20  # per county

FIXTURE_DIR = os.path.join(
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
    "tests",
    "fixtures",
    "demand",
)


def pop(c: int, y: int) -> int:
    return 900_000 + 600_000 * c + (y - 2008) * (8_000 + 2_000 * c)


def hh(c: int, y: int) -> int:
    return 330_000 + 150_000 * c + (y - 2008) * 2_500


def hhinc(c: int, y: int) -> int:
    return 60_000 + 15_000 * c + (y - 2008) * 1_200


def jtw(c: int, y: int) -> tuple[int, int, int]:
    """(drive-alone, transit, walk) journey-to-work counts."""
    return (
        6_000 - 200 * (y - 2008) - 1_000 * c,
        2_500 + 100 * (y - 2008) + 800 * c,
        1_500 + 100 * (y - 2008) + 200 * c,
    )


def cpi(y: int, m: int) -> int:
    """Monthly CPI level (integer by construction)."""
    return 205 + (y - 2007) * 4 + m


def cpi_half1(y: int) -> float:
    """First-half mean = base + 3.5 — exactly representable."""
    return 205 + (y - 2007) * 4 + 3.5


CPI_BASE_2010 = cpi_half1(2010)  # the reference's 2010 HALF1 base


def block_geocode(fips: str, b: int) -> str:
    """15-digit LODES block geocode within the county."""
    return f"{fips}001001{b:04d}"


def lodes_jobs(c: int, b: int, y: int) -> int:
    return 50 + 3 * b + 7 * (y - 2008) + 11 * c


def qcew_emp(c: int, y: int, m: int) -> int:
    """County employment level for calendar month m (1..12)."""
    return 500_000 + 200_000 * c + (y - 2008) * 3_000 + (m - 1) * 100


def write_fixtures(outdir: str = FIXTURE_DIR) -> None:
    """Regenerate the committed CSVs from the formulas (used once to
    create them; the drift-guard test re-runs this into a temp dir
    and compares bytes)."""
    os.makedirs(outdir, exist_ok=True)

    # pre-2010 intercensal estimates: wide POPESTIMATE<year> columns
    with open(os.path.join(outdir, "pop_pre2010.csv"), "w") as f:
        f.write("STATE,COUNTY,POPESTIMATE2008,POPESTIMATE2009\n")
        for fips, c in COUNTIES:
            f.write(
                f"{int(fips[:2])},{int(fips[2:])},"
                f"{pop(c, 2008)},{pop(c, 2009)}\n"
            )

    # post-2010 estimates: title row, then the verbose headers
    with open(os.path.join(outdir, "pop_post2010.csv"), "w") as f:
        f.write("Annual Estimates of the Resident Population\n")
        cols = ",".join(
            f'"Population Estimate (as of July 1) - {y}"'
            for y in (2010, 2011, 2012)
        )
        f.write(f"Id,Id2,Geography,{cols}\n")
        for fips, c in COUNTIES:
            vals = ",".join(str(pop(c, y)) for y in (2010, 2011, 2012))
            f.write(f"0500000US{fips},{int(fips)},County {c},{vals}\n")

    # ACS county-year table
    with open(os.path.join(outdir, "acs.csv"), "w") as f:
        f.write(
            "FIPS,YEAR,HH,MEDIAN_HHINC,JTW_DA,JTW_TRANSIT,JTW_WALK\n"
        )
        for fips, c in COUNTIES:
            for y in YEARS:
                da, tr, wk = jtw(c, y)
                f.write(
                    f"{fips},{y},{hh(c, y)},{hhinc(c, y)},{da},{tr},{wk}\n"
                )

    # BLS CPI: wide months + half-year means
    months = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
              "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
    with open(os.path.join(outdir, "cpi.csv"), "w") as f:
        f.write("Year," + ",".join(months) + ",HALF1,HALF2\n")
        for y in CPI_YEARS:
            vals = ",".join(str(cpi(y, m)) for m in range(1, 13))
            h1 = cpi_half1(y)
            h2 = h1 + 6
            f.write(f"{y},{vals},{h1},{h2}\n")

    # LODES RAC: block-level jobs
    with open(os.path.join(outdir, "lodes_rac.csv"), "w") as f:
        f.write("h_geocode,C000,YEAR\n")
        for fips, c in COUNTIES:
            for b in range(N_BLOCKS):
                for y in YEARS:
                    f.write(
                        f"{block_geocode(fips, b)},"
                        f"{lodes_jobs(c, b, y)},{y}\n"
                    )

    # block → county crosswalk
    with open(os.path.join(outdir, "crosswalk.csv"), "w") as f:
        f.write("tabblk2010,cty\n")
        for fips, _ in COUNTIES:
            for b in range(N_BLOCKS):
                f.write(f"{block_geocode(fips, b)},{fips}\n")

    # QCEW quarterly files: month1-3 employment levels per quarter
    with open(os.path.join(outdir, "qcew.csv"), "w") as f:
        f.write(
            "area_fips,year,qtr,month1_emplvl,month2_emplvl,month3_emplvl\n"
        )
        for fips, c in COUNTIES:
            for y in YEARS:
                for q in range(1, 5):
                    m0 = 3 * (q - 1)
                    f.write(
                        f"{fips},{y},{q},"
                        f"{qcew_emp(c, y, m0 + 1)},"
                        f"{qcew_emp(c, y, m0 + 2)},"
                        f"{qcew_emp(c, y, m0 + 3)}\n"
                    )
