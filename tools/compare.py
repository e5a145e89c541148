#!/usr/bin/env python3
"""Compare graft.Verify parquet dumps against DuckDB oracle results.

Mirrors the driver's t2 gate: for each query, run its oracle SQL in DuckDB
(views named after the parquet tables in sfDir), sort columns by name, sort
rows, and compare values exactly (floats: exact bitwise, with a reported max
abs diff when mismatching).
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), na_position="last")
    return df.reset_index(drop=True)


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    pattern = sys.argv[3] if len(sys.argv) > 3 else ""
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    # Queries that threw during the dump leave no parquet; Verify persists
    # them to _failures.json so they surface HERE as FAILs instead of being
    # silently absent (covers rows-only queries with no oracle entry too).
    fail_path = Path(out_dir) / "_failures.json"
    failures = json.loads(fail_path.read_text()) if fail_path.exists() else {}
    for name in sorted(failures):
        if pattern and pattern not in name:
            continue
        print(f"FAIL {name}: threw during dump: {failures[name]}")
        n_fail += 1
    for name in sorted(oracle):
        if pattern and pattern not in name:
            continue
        if name in failures:
            continue  # already reported as a dump-time FAIL above
        sql = oracle[name]
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: spark result missing")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(res_dir)
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        bad = []
        for c in g.columns:
            a, b = g[c], w[c]
            if str(a.dtype) != str(b.dtype):
                # numeric mismatch: promote BOTH to the common supertype.
                # Casting the oracle to the Spark dtype was lossy (float64
                # -> int64 truncates), so a Spark result equal to the
                # FLOOR of the oracle's float compared as a false PASS.
                if pd.api.types.is_numeric_dtype(a) and \
                        pd.api.types.is_numeric_dtype(b):
                    import numpy as np
                    common = np.promote_types(a.dtype, b.dtype)
                    a, b = a.astype(common), b.astype(common)
                else:
                    try:
                        b = b.astype(a.dtype)
                    except Exception:
                        bad.append(f"{c}: dtype {a.dtype} vs {w[c].dtype}")
                        continue
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                i = (~eq).idxmax()
                detail = f"row {i}: {a[i]!r} vs {b[i]!r}"
                if pd.api.types.is_float_dtype(a):
                    detail += f" (maxdiff {float((a - b).abs().max()):.3g})"
                bad.append(f"{c}: {(~eq).sum()} diffs, {detail}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
