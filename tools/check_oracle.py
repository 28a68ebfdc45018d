#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against the
sfDir tables, and compares: column names, row count, and values
(sorted columns, sorted rows, exact match; floats compared exactly
after string normalization, with a reported near-miss count).
"""
import json
import math
import os
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


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
        got = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        want = con.sql(oracle[name])
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} != {wcols}")
            n_fail += 1
            continue
        grows = sorted(
            tuple(norm_cell(v) for v in row)
            for row in got.select(", ".join(f'"{c}"' for c in gcols)).fetchall())
        wrows = sorted(
            tuple(norm_cell(v) for v in row)
            for row in want.select(", ".join(f'"{c}"' for c in wcols)).fetchall())
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
    # queries with no oracle → rows-only smoke
    for qdir in sorted(Path(out_dir).iterdir()):
        if qdir.is_dir() and qdir.name not in oracle:
            n = con.sql(f"SELECT count(*) FROM read_parquet('{qdir}/*.parquet')").fetchone()[0]
            print(f"INFO {qdir.name}: no oracle, {n} rows")
    print(f"\n{n_pass} pass, {n_fail} fail" + (f", {n_skip} SKIPPED" if n_skip else ""))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
