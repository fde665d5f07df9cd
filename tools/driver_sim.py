"""Simulate the driver's correctness gate as closely as we can.

Differences from tests/test_oracle.py (the lenient local mirror):
- builds a FRESH SparkSession with none of the engine's session confs,
  exactly like the driver harness does;
- goes through ``__spark_entry__.queries()`` / ``oracle_sql()`` (the
  driver's actual surface), not the internal REGISTRY;
- canonicalizes via pandas (sort columns by name, sort_values over all
  columns, stringify, hash) — the same shape as the driver's ``_canon``
  that choked on list-typed columns in round 1.

Run from the repo root:

    python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def _canon(df: pd.DataFrame) -> tuple[list[str], str]:
    cols = sorted(df.columns)
    df = df[cols]
    if len(df):
        df = df.sort_values(by=cols).reset_index(drop=True)
    # stringify cell-by-cell so dtype differences (decimal vs float64
    # vs object) don't change the hash unless the VALUES differ
    s = df.astype(str)
    h = hashlib.sha256()
    for row in s.itertuples(index=False):
        h.update(("\x1f".join(row) + "\n").encode())
    return cols, h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    results: dict[str, dict] = {}
    n_pass = n_fail = n_noracle = 0
    for name in sorted(queries):
        if only and name not in only:
            continue
        row: dict = {}
        try:
            sdf = queries[name](spark, sf_dir)
            spdf = sdf.toPandas()
            if name not in oracles:
                row = {"rows": len(spdf), "status": "no_oracle"}
                n_noracle += 1
            else:
                odf = con.execute(oracles[name]).df()
                s_cols, s_hash = _canon(spdf)
                o_cols, o_hash = _canon(odf)
                ok = (
                    len(spdf) == len(odf)
                    and s_cols == o_cols
                    and s_hash == o_hash
                )
                row = {
                    "rows_match": len(spdf) == len(odf),
                    "schema_match": s_cols == o_cols,
                    "hash_match": s_hash == o_hash,
                    "spark_rows": len(spdf),
                    "oracle_rows": len(odf),
                }
                if ok:
                    n_pass += 1
                else:
                    n_fail += 1
                    row["spark_cols"] = s_cols
                    row["oracle_cols"] = o_cols
        except Exception:
            row = {"status": "error", "err": traceback.format_exc()[-1500:]}
            n_fail += 1
        results[name] = row
        status = (
            "PASS"
            if row.get("hash_match")
            else ("rows-only" if row.get("status") == "no_oracle" else "FAIL")
        )
        print(f"{name}: {status}", flush=True)

    print(
        json.dumps(
            {"pass": n_pass, "fail": n_fail, "no_oracle": n_noracle},
        )
    )
    with open("/tmp/driver_sim.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
