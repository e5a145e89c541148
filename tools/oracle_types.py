#!/usr/bin/env python3
"""Sweep every oracle SQL for output columns whose DuckDB type cannot
round-trip through the compare harness against a Spark result.

DuckDB widens SUM(BIGINT) to HUGEINT and AVG-less integer division to
DECIMAL; pandas renders both as float64/object while Spark emits int64,
so the hash compare diverges even when values are identical (the
f_feature_hash / text_naive_bayes round-3 failures). This tool DESCRIBEs
each oracle query (no execution) and flags HUGEINT / UHUGEINT / DECIMAL
columns so the trap is caught at authoring time, not judge time.

Usage: tools/oracle_types.py [sfDir] [oracle_sql.json]
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

BAD_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    oracle_path = Path(sys.argv[2] if len(sys.argv) > 2
                       else "/tmp/graft_verify/oracle_sql.json")
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads(oracle_path.read_text())
    n_flag = 0
    for name in sorted(oracle):
        try:
            desc = con.sql("DESCRIBE " + oracle[name]).fetchall()
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_flag += 1
            continue
        bad = [(c, ty) for c, ty, *_ in desc
               if any(ty.upper().startswith(b) for b in BAD_TYPES)]
        if bad:
            n_flag += 1
            cols = ", ".join(f"{c}: {ty}" for c, ty in bad)
            print(f"FLAG {name}: {cols}")
    print(f"== {n_flag} flagged of {len(oracle)} oracles")
    return 1 if n_flag else 0


if __name__ == "__main__":
    sys.exit(main())
