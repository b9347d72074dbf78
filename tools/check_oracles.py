"""Local replica of the driver's correctness gate.

Runs each ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` on DuckDB over the same parquet dir, then compares
row count, column names, and (column-name-sorted, row-sorted) values.
Exact comparison — floats too — because the driver hashes values.

Usage: python tools/check_oracles.py [--sf DIR] [--out FILE.json] [name ...]

``--out`` writes a machine-readable per-query record (status, rows,
seconds, problems) — commit it as CORRECTNESS_local_r{N}.json each
round so the full-contract sweep is on the record alongside the
driver's sampled gate (VERDICT r3 #4).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # bytes → hex for stable compare
            df[c] = df[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def canonicalize_rows_only(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror of the driver's rows-only canonicalization: a plain pandas
    sort_values over all columns WITHOUT stringifying non-scalars first.
    Running it here surfaces the exact failure the driver would hit
    (e.g. TypeError: unhashable type: 'list' on array columns)."""
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            af = pd.to_numeric(a[c], errors="coerce").to_numpy(dtype=float)
            bf = pd.to_numeric(b[c], errors="coerce").to_numpy(dtype=float)
            nan_match = np.isnan(af) == np.isnan(bf)
            both = ~np.isnan(af) & ~np.isnan(bf)
            exact = np.array_equal(af[both], bf[both])
            if not (nan_match.all() and exact):
                bad = both & (af != bf)
                maxdiff = np.abs(af[bad] - bf[bad]).max() if bad.any() else float("nan")
                problems.append(
                    f"col {c}: {int((~nan_match).sum())} nan-mismatch, "
                    f"{int(bad.sum())} value-mismatch (max abs diff {maxdiff:.3e})"
                )
        else:
            if not (pd.Series(av).fillna("\0NULL") == pd.Series(bv).fillna("\0NULL")).all():
                n_bad = int((pd.Series(av).fillna("\0NULL") != pd.Series(bv).fillna("\0NULL")).sum())
                problems.append(f"col {c}: {n_bad} mismatched values")
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None, help="write per-query JSON record")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from dachshund_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8, driver_memory="8g")
    con = duck_connection(args.sf)

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or list(qs)
    failures = 0
    record: dict[str, dict] = {}

    def done(name, status, t0, rows=None, problems=None):
        record[name] = {
            "status": status,
            "rows": rows,
            "seconds": round(time.time() - t0, 2),
            "problems": problems or [],
        }

    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            spark_pdf = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            done(name, "spark_error", t0, problems=[str(exc)[:500]])
            continue
        if name not in oracles:
            try:
                canonicalize_rows_only(spark_pdf)
            except Exception as exc:  # noqa: BLE001
                print(f"FAIL {name}: rows-only canonicalization error "
                      f"(driver would reject): {exc}")
                failures += 1
                done(name, "canon_error", t0, rows=len(spark_pdf),
                     problems=[str(exc)[:500]])
                continue
            print(f"ok   {name}: rows-only ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            done(name, "rows_only_ok", t0, rows=len(spark_pdf))
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            done(name, "duckdb_error", t0, rows=len(spark_pdf),
                 problems=[str(exc)[:500]])
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL {name} ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            for p in problems:
                print(f"     {p}")
            done(name, "mismatch", t0, rows=len(spark_pdf), problems=problems)
        else:
            print(f"ok   {name}: MATCH ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            done(name, "match", t0, rows=len(spark_pdf))
    print(f"{len(names) - failures}/{len(names)} ok")
    if args.out:
        summary = {
            "sf_dir": args.sf,
            "total": len(names),
            "ok": len(names) - failures,
            "queries": record,
        }
        with open(args.out, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
        print(f"wrote {args.out}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
