"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at the given sf dir, compare
row-count + column names + order-insensitive values."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# namespace the oracle staging dir per process BEFORE entry_queries builds
# its SQL strings: concurrent local gates must not race on staged parquet
os.environ.setdefault("LJ_ORACLE_STAGE", f"/tmp/lj_oracle_{os.getpid()}")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _kind(s: pd.Series) -> str:
    k = s.dtype.kind
    return "i" if k in "iu" else k


def compare(name, sdf, odf) -> str:
    if len(sdf) != len(odf):
        return f"ROWS {len(sdf)} vs {len(odf)}"
    if sorted(sdf.columns) != sorted(odf.columns):
        return f"SCHEMA {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    # dtype-class mismatch (e.g. DuckDB HUGEINT -> object vs Spark BIGINT)
    # trips the driver's exact value hash even when values are equal
    for c in sdf.columns:
        ka, kb = _kind(sdf[c]), _kind(odf[c])
        if ka != kb and "O" in (ka, kb) and len(sdf):
            return f"DTYPE col={c}: {sdf[c].dtype} vs {odf[c].dtype} (cast the oracle)"
    a, b = normalize(sdf), normalize(odf)
    ulp = False
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
            exact = (av == bv) | (av.isna() & bv.isna())
            ok = ((av - bv).abs() < 1e-6) | (av.isna() & bv.isna())
            if ok.all() and not exact.all():
                ulp = True  # passes here, but a hash-gate risk
        else:
            ok = (av.astype(str) == bv.astype(str)) | (av.isna() & bv.isna())
        if not ok.all():
            i = int((~ok).idxmax())
            return f"VALUES col={c} row={i}: {av[i]!r} vs {bv[i]!r}"
    return "OK~ (float ulp diff <1e-6 — exact-hash risk)" if ulp else "OK"


def main(sf_dir: str, only: list[str]):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as se
    from logjuicer_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = se.queries()
    oracles = se.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(sdf)} rows")
            continue
        odf = con.execute(oracles[name]).df()
        verdict = compare(name, sdf, odf)
        print(f"{name:24s} {verdict}  ({len(sdf)} rows)")
        if not verdict.startswith("OK"):
            failures += 1
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    main(sf, sys.argv[2:])
