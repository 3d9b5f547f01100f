"""Local differential checker mimicking the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at the given sf dir, then compares row count, column names, and
values (rows sorted, columns sorted by name). Stricter than needed:
reports exact-match vs close-match (rtol 1e-9) separately so
float-hash risk is visible.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def canon(df) -> tuple[list[str], list[tuple]]:
    """pandas DataFrame -> (sorted col names, sorted row tuples)."""
    import pandas as pd

    cols = sorted(df.columns)
    out = df[cols].copy()
    rows = []
    for row in out.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append(None)
            elif hasattr(v, "isoformat"):
                vals.append(v.isoformat())
            elif isinstance(v, (int,)):
                vals.append(int(v))
            else:
                try:
                    import numpy as np

                    if isinstance(v, np.integer):
                        vals.append(int(v))
                    elif isinstance(v, np.floating):
                        vals.append(float(v))
                    else:
                        vals.append(v)
                except Exception:
                    vals.append(v)
        rows.append(tuple(vals))
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


def rows_equal(a, b, exact=True):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            if va is None and vb is None:
                continue
            if isinstance(va, float) and isinstance(vb, float):
                if exact:
                    if va != vb:
                        return False
                elif not math.isclose(va, vb, rel_tol=1e-9, abs_tol=1e-12):
                    return False
            elif va != vb:
                return False
    return True


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json-out" in argv:  # VERDICT r12 ask #3: committable summary
        i = argv.index("--json-out")
        if i + 1 >= len(argv):
            sys.exit("usage: --json-out PATH (missing PATH)")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import duckdb

    import __spark_entry__ as entry_mod
    from sfdata_wrangler_spark.session import get_spark

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qmap = entry_mod.queries()
    omap = entry_mod.oracle_sql()
    failures, passes = [], []
    summary: dict[str, dict] = {}
    for name, fn in qmap.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            # operator-level persist() entries (shingle streams,
            # oriented edges, entity blocks) live in CacheManager for
            # the session lifetime; release them between queries so a
            # 233-query sweep doesn't accumulate corpus-scale caches
            spark.catalog.clearCache()
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            summary[name] = {"ok": False, "status": "spark-error"}
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        if name not in omap:
            status = "rows-only OK" if len(sdf) > 0 else "rows-only EMPTY"
            ok = len(sdf) > 0
            (passes if ok else failures).append((name, status))
            summary[name] = {
                "ok": ok,
                "status": "rows-only" if ok else "rows-only-empty",
                "rows": len(sdf),
                "wall_s": round(time.time() - t0, 1),
            }
            print(f"{'ok  ' if ok else 'FAIL'} {name}: {status} "
                  f"rows={len(sdf)} [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.sql(omap[name]).df()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            summary[name] = {"ok": False, "status": "oracle-error"}
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            continue
        scols, srows = canon(sdf)
        ocols, orows = canon(odf)
        status = None
        if scols != ocols:
            status = f"SCHEMA MISMATCH spark={scols} duck={ocols}"
        elif len(srows) != len(orows):
            status = f"ROWCOUNT MISMATCH spark={len(srows)} duck={len(orows)}"
        elif rows_equal(srows, orows, exact=True):
            status = "OK-exact"
        elif rows_equal(srows, orows, exact=False):
            status = "OK-close (float ulp diff!)"
        else:
            # find first differing row
            diff = next(
                (i, ra, rb)
                for i, (ra, rb) in enumerate(zip(srows, orows))
                if not rows_equal([ra], [rb], exact=False)
            )
            status = f"VALUE MISMATCH at sorted-row {diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}"
        ok = status.startswith("OK")
        (passes if ok else failures).append((name, status))
        summary[name] = {
            "ok": ok,
            "status": (
                "exact" if status == "OK-exact"
                else "close" if ok
                else status.split("\n")[0][:120]
            ),
            "rows": len(srows),
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"{'ok  ' if ok else 'FAIL'} {name}: {status} rows={len(srows)} "
              f"[{time.time()-t0:.1f}s]")

    print(f"\n{len(passes)} passed, {len(failures)} failed")
    if json_out:
        # VERDICT r12 ask #3: the committable per-round evidence that
        # the FULL registry (not just the driver's 50-query rotation)
        # was oracle-verified — one compact row per query
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "generated_at": time.strftime(
                        "%Y-%m-%dT%H:%M:%S", time.gmtime()
                    ),
                    "passed": len(passes),
                    "failed": len(failures),
                    "queries": summary,
                },
                fh,
                indent=0,
                sort_keys=True,
            )
        print(f"summary written to {json_out}")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
