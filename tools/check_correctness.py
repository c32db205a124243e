"""Local stand-in for the driver's correctness gate.

Runs every probe's Spark query and DuckDB oracle at a given sf dir,
compares row count, column names, and (order-insensitively) values.
Reports EXACT when values match bit-for-bit after canonicalization,
CLOSE when they only match within 1e-9 (a hash-compare would fail —
fix the probe's rounding), MISMATCH otherwise.

Usage: python tools/check_correctness.py [sf_dir] [probe ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]")
        if s.dtype == object and len(s) and isinstance(s.dropna().iloc[0] if s.dropna().size else None, (list, np.ndarray)):
            s = s.map(lambda v: tuple(np.asarray(v).tolist()) if v is not None else None)
        out[c] = s
    df = pd.DataFrame(out)
    return df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str:
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return f"SCHEMA MISMATCH spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
    if len(spark_pdf) != len(duck_pdf):
        return f"ROWCOUNT MISMATCH spark={len(spark_pdf)} duck={len(duck_pdf)}"
    a, b = canon(spark_pdf), canon(duck_pdf)
    exact = True
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            avf = av.astype(float).to_numpy()
            bvf = bv.astype(float).to_numpy()
            both_nan = np.isnan(avf) & np.isnan(bvf)
            eq = (avf == bvf) | both_nan
            if not eq.all():
                close = np.isclose(avf, bvf, rtol=1e-9, atol=1e-12, equal_nan=True)
                if close.all():
                    exact = False
                else:
                    i = int(np.argmin(close))
                    return f"VALUE MISMATCH col={c} row{i}: {avf[i]!r} vs {bvf[i]!r}"
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                return f"VALUE MISMATCH col={c} row{i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}"
    return "EXACT" if exact else "CLOSE(float-only)"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    from flytemosaic_spark.probes import all_probes
    from flytemosaic_spark.session import get_spark
    from flytemosaic_spark.sources.tables import TABLE_NAMES

    spark = get_spark("check-correctness", cpus=8, driver_memory="8g")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, p in sorted(all_probes().items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = p.fn(spark, sf_dir).toPandas()
        except Exception:
            failures.append(name)
            print(f"{name:28s} SPARK ERROR\n{traceback.format_exc()}")
            continue
        if p.sql is None:
            print(f"{name:28s} rows={len(spark_pdf):7d}  (no oracle)  {time.time()-t0:.1f}s")
            continue
        try:
            duck_pdf = con.execute(p.sql).fetchdf()
        except Exception:
            failures.append(name)
            print(f"{name:28s} DUCKDB ERROR\n{traceback.format_exc()}")
            continue
        verdict = compare(spark_pdf, duck_pdf)
        status = "OK " if verdict.startswith("EXACT") else ("~  " if verdict.startswith("CLOSE") else "FAIL")
        if status == "FAIL":
            failures.append(name)
        print(f"{name:28s} {status} rows={len(spark_pdf):7d}  {verdict}  {time.time()-t0:.1f}s")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall probes pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
