#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against the
sfDir tables, and compares: column names, row count, and values
(sorted columns, sorted rows, exact match).

DRIVER PARITY: the SPARK side is read through pyarrow (as the driver
reads it), the ORACLE side through DuckDB's pandas `.df()` — NOT both
through DuckDB, and NOT `fetchall()`. The two escapes this asymmetric
read catches that a symmetric one provably cannot:
  * round-9 `q_pack_shards`: DuckDB HUGEINT degrades to float64 in
    pandas (`126.0`) while Spark's int64 stays `126`;
  * round-12 `q_rollup_card`: Spark decimal128(38,6) materializes as
    python `Decimal('19525.000000')` through pyarrow while DuckDB's
    HUGEINT-backed DECIMAL(38,6) degrades to float64 `19525.0` —
    equal values, different reprs, driver hash mismatch. Reading the
    Spark side through DuckDB made both sides degrade identically,
    so the old gate said PASS on the exact output the driver FAILed.
Any per-column dtype-class difference (int vs float) between the two
frames is also printed as a WARN line even when the values match.
"""
import datetime
import json
import math
import os
import sys
from pathlib import Path

import duckdb
import numpy as np
import pyarrow.dataset as pa_ds
import pyarrow.parquet as pa_pq


def read_spark_df(qdir):
    """Read a Verify query output directory the way the DRIVER does:
    pyarrow -> pandas (decimals stay Decimal, int64 stays int64)."""
    return pa_pq.read_table(str(qdir)).to_pandas()


def read_spark_schema_df(qdir):
    """LIMIT-0 twin of read_spark_df: pandas dtypes from the parquet
    schema alone, nothing materialized."""
    return pa_ds.dataset(str(qdir), format="parquet").schema \
        .empty_table().to_pandas()

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "NULL"
    # The pyarrow spark-side read yields datetime.date for DATE
    # columns while DuckDB's .df() yields midnight Timestamps for the
    # same values — the driver hashes those equal (its r12 board is
    # green on q_dau_mau / q_jalali_inverse / q_moving_avg /
    # q_trend_line), so canonicalize both to one timestamp repr.
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return f"{v} 00:00:00"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (list, np.ndarray)):
        return str([norm_cell(x) for x in v])
    return str(v)


def dtype_class(dt):
    k = dt.kind if hasattr(dt, "kind") else "O"
    return {"i": "int", "u": "int", "f": "float", "b": "bool"}.get(k, "other")


def dtype_sweep(sf_dir, out_dir):
    """LIMIT-0 dtype sweep: compare every query's Spark output column
    dtype CLASSES against its oracle's, without materializing either
    side — the cheap board-wide guard that a HUGEINT/float64 drift
    (the round-9 q_pack_shards escape) can never reach the driver's
    hash compare, runnable even when the expensive value replay is
    skipped. Exit 1 on any class mismatch."""
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_bad = 0
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        got = read_spark_schema_df(qdir)
        want = con.sql(f"SELECT * FROM ({oracle[name]}) __q LIMIT 0").df()
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(want.columns)}")
            n_bad += 1
            continue
        for c in sorted(got.columns):
            gk, wk = dtype_class(got[c].dtype), dtype_class(want[c].dtype)
            if gk != wk:
                print(f"FAIL {name}: column {c} dtype class spark={got[c].dtype} "
                      f"oracle={want[c].dtype}")
                n_bad += 1
    print(f"\ndtype sweep: {len(oracle)} queries, {n_bad} mismatches")
    return 1 if n_bad else 0


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    # GRAFT_ORACLE_SKIP: comma-separated query names whose (slow) replay
    # is deliberately skipped THIS RUN — printed loudly, never silent.
    # Used by the sf1 gate for replays already proven at sf1 in a prior
    # round whose operator code has not changed since.
    skip = set(filter(None, os.environ.get("GRAFT_ORACLE_SKIP", "").split(",")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if name in skip:
            print(f"SKIP {name}: replay skipped via GRAFT_ORACLE_SKIP")
            n_skip += 1
            continue
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        gdf = read_spark_df(qdir)
        want = con.sql(oracle[name])
        gcols, wcols = sorted(gdf.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} != {wcols}")
            n_fail += 1
            continue
        wdf = want.df()
        for c in gcols:
            gk, wk = dtype_class(gdf[c].dtype), dtype_class(wdf[c].dtype)
            if gk != wk:
                print(f"WARN {name}: column {c} dtype class spark={gdf[c].dtype} "
                      f"oracle={wdf[c].dtype} (pandas materialization)")
            elif gk in ("int", "float") and str(gdf[c].dtype) != str(wdf[c].dtype):
                print(f"NOTE {name}: column {c} width spark={gdf[c].dtype} "
                      f"oracle={wdf[c].dtype} (benign for the value compare)")
        grows = sorted(
            tuple(norm_cell(v) for v in row)
            for row in gdf[gcols].itertuples(index=False, name=None))
        wrows = sorted(
            tuple(norm_cell(v) for v in row)
            for row in wdf[wcols].itertuples(index=False, name=None))
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rows {len(grows)} != {len(wrows)}")
            n_fail += 1
            continue
        bad = [(g, w) for g, w in zip(grows, wrows) if g != w]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(grows)} mismatched rows; first: ")
            for g, w in bad[:3]:
                print(f"   spark={g}\n   duck ={w}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    # queries with no oracle → rows-only smoke, through the driver's
    # pandas sort so unhashable cells (arrays) fail HERE, not there
    for qdir in sorted(Path(out_dir).iterdir()):
        if qdir.is_dir() and qdir.name not in oracle:
            df = read_spark_df(qdir)
            try:
                df.sort_values(by=list(df.columns), inplace=False)
                print(f"INFO {qdir.name}: no oracle, {len(df)} rows")
            # multi-column frames with array cells raise TypeError,
            # SINGLE-column ones raise ValueError ("truth value of an
            # array is ambiguous") — catch both so one bad query can
            # never abort the whole checker
            except (TypeError, ValueError) as e:
                print(f"FAIL {qdir.name}: rows-only pandas sort crashed: {e}")
                n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail" + (f", {n_skip} SKIPPED" if n_skip else ""))
    return 1 if n_fail else 0


if __name__ == "__main__":
    if "--dtypes-only" in sys.argv:
        sys.exit(dtype_sweep(sys.argv[1], sys.argv[2]))
    sys.exit(main(sys.argv[1], sys.argv[2]))
