"""Full-registry oracle sweep at an arbitrary SF (round-11 gap: the
pre-round-9 registry had only ever been hash-checked at sf0.001/0.01;
tie densities and day-series lengths at sf0.1 are what the
window-heavy older queries are sensitive to).

Driver-faithful like tools/driver_sim.py (fresh unconfigured session,
``__spark_entry__`` surface, pandas stringify-hash canonicalization),
plus what a bench-SF sweep needs that driver_sim lacks:

- a DuckDB interrupt watchdog per oracle (``--timeout``, default
  300 s): the deliberate O(n^2) brute-force oracles hang for 45+ min
  at sf0.1, and an unknown-quadratic oracle should surface as a
  recorded TIMEOUT, not a wedged session;
- the ``quadratic-oracle`` tag gate (same bound as test_oracle.py)
  now SLICES instead of skipping (round-11 verdict item 5): above 1k
  documents the full O(n^2) DuckDB CTE is infeasible (sf0.1 is 5k
  docs x long texts — q206's all-pairs oracle measured 45+ min), but
  the gate was the ORACLE's cost, not the engine's, so tagged queries
  are hash-checked at the bench SF against a deterministic
  ``doc_id % m == 0`` corpus slice of <= 1k documents (every other
  table untouched; engine and oracle both read the same slice — the
  q140 corpus-x-subset pattern that always stayed ungated). Status
  ``sliced`` + the usual match fields; no gated query remains
  bench-SF-unchecked on its engine path;
- resumability: results stream into the output JSON after every
  query, and an existing file's entries are skipped on rerun — a
  killed sweep continues where it stopped.

Run from the repo root:

    python tools/sf_sweep.py [sf_dir] [--timeout S] [--out F] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import threading
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

QUADRATIC_ORACLE_MAX_DOCS = 1_000
_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings".split()
)


def _canon(df: pd.DataFrame) -> tuple[list[str], str]:
    cols = sorted(df.columns)
    df = df[cols]
    if len(df):
        df = df.sort_values(by=cols).reset_index(drop=True)
    s = df.astype(str)
    h = hashlib.sha256()
    for row in s.itertuples(index=False):
        h.update(("\x1f".join(row) + "\n").encode())
    return cols, h.hexdigest()


def _connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _slice_dir(sf_dir: str, n_docs: int) -> tuple[str, int]:
    """Materialize (once) a bench-SF fixture dir whose documents table
    is the deterministic every-``m``-th-row slice of <= 1k docs
    (row rank, not doc_id value — identical on the dense fixtures,
    but rank bounds the row count even under sparse/strided ids);
    every other table is symlinked unchanged. Both engines read the
    same files, so the hash compare is exact — the slice only bounds
    the ORACLE's O(n^2) pair CTE, which is the sole reason these
    queries were gated."""
    sf_dir = os.path.abspath(sf_dir)  # symlink targets must survive cwd
    m = (n_docs + QUADRATIC_ORACLE_MAX_DOCS - 1) // QUADRATIC_ORACLE_MAX_DOCS
    base = os.path.basename(sf_dir.rstrip("/"))
    out = f"/tmp/sf_slice_{base}_m{m}"
    marker = os.path.join(out, ".complete")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
        # slice by ROW RANK, not doc_id value: sparse/strided ids
        # would leave more than n/m rows behind a value-modulus and
        # blow the quadratic-oracle budget (ADVICE r12)
        mask = pa.array(i % m == 0 for i in range(t.num_rows))
        sliced = t.filter(mask)
        assert sliced.num_rows <= QUADRATIC_ORACLE_MAX_DOCS, (
            f"slice still over budget: {sliced.num_rows} docs > "
            f"{QUADRATIC_ORACLE_MAX_DOCS} (m={m}, base {t.num_rows})"
        )
        pq.write_table(sliced, os.path.join(out, "documents.parquet"))
        for tab in _TABLES:
            if tab == "documents":
                continue
            dst = os.path.join(out, f"{tab}.parquet")
            if not os.path.exists(dst):
                os.symlink(os.path.join(sf_dir, f"{tab}.parquet"), dst)
        with open(marker, "w") as f:
            f.write(str(m))
    import pyarrow.parquet as pq

    sliced_n = pq.ParquetFile(
        os.path.join(out, "documents.parquet")
    ).metadata.num_rows
    return out, sliced_n


def main() -> int:
    args = [a for a in sys.argv[1:]]
    timeout = 300.0
    out_path = None
    if "--timeout" in args:
        i = args.index("--timeout")
        timeout = float(args[i + 1])
        del args[i : i + 2]
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    only = set(args[1:])
    if out_path is None:
        out_path = f"/tmp/sf_sweep_{os.path.basename(sf_dir.rstrip('/'))}.json"

    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")
    ).metadata.num_rows

    import __spark_entry__ as entry
    from kaflow_spark.queries import REGISTRY

    queries = entry.queries()
    oracles = entry.oracle_sql()

    results: dict[str, dict] = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]"
        )
        .appName("sf-sweep")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = _connect(sf_dir)
    slice_sf_dir: str | None = None
    slice_con = None
    sliced_n = 0
    n_pass = n_fail = n_other = 0

    def _compare(name: str, run_dir: str, run_con) -> tuple[dict, bool | None]:
        """Run engine + oracle on one fixture dir; (row, failed)."""
        t0 = time.monotonic()
        spdf = queries[name](spark, run_dir).toPandas()
        spark_s = time.monotonic() - t0
        if name not in oracles:
            return (
                {
                    "rows": len(spdf),
                    "status": "no_oracle",
                    "spark_s": round(spark_s, 2),
                },
                None,
            )
        t1 = time.monotonic()
        timer = threading.Timer(timeout, run_con.interrupt)
        timer.daemon = True
        timer.start()
        try:
            odf = run_con.execute(oracles[name]).df()
        finally:
            timer.cancel()
        oracle_s = time.monotonic() - t1
        s_cols, s_hash = _canon(spdf)
        o_cols, o_hash = _canon(odf)
        ok = (
            len(spdf) == len(odf) and s_cols == o_cols and s_hash == o_hash
        )
        row = {
            "rows_match": len(spdf) == len(odf),
            "schema_match": s_cols == o_cols,
            "hash_match": s_hash == o_hash,
            "spark_rows": len(spdf),
            "oracle_rows": len(odf),
            "spark_s": round(spark_s, 2),
            "oracle_s": round(oracle_s, 2),
        }
        if not ok:
            row["spark_cols"] = s_cols
            row["oracle_cols"] = o_cols
        return row, not ok

    for name in sorted(queries):
        if only and name not in only:
            continue
        if name in results and results[name].get("status") not in (
            "error",
            "timeout",
            "gated",  # pre-round-12 artifacts: upgrade to the sliced check
        ):
            continue  # resumable: keep prior pass rows
        tags = REGISTRY[name].tags if name in REGISTRY else ()
        use_slice = (
            "quadratic-oracle" in tags and n_docs > QUADRATIC_ORACLE_MAX_DOCS
        )
        run_dir, run_con = sf_dir, con
        if use_slice:
            if slice_sf_dir is None:
                slice_sf_dir, sliced_n = _slice_dir(sf_dir, n_docs)
                slice_con = _connect(slice_sf_dir)
            run_dir, run_con = slice_sf_dir, slice_con
        try:
            row, failed = _compare(name, run_dir, run_con)
            if failed is None:
                n_other += 1
            elif failed:
                n_fail += 1
            else:
                n_pass += 1
            if use_slice:
                row["status"] = "sliced"
                row["sliced_docs"] = sliced_n
                row["full_docs"] = n_docs
        except duckdb.InterruptException:
            row = {"status": "timeout", "timeout_s": timeout}
            n_fail += 1
            if use_slice:
                slice_con.close()
                slice_con = _connect(slice_sf_dir)
            else:
                con.close()
                con = _connect(sf_dir)
        except Exception:
            row = {
                "status": "error",
                "err": traceback.format_exc()[-1500:],
            }
            n_fail += 1
        results[name] = row
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1, default=str)
        r = results[name]
        if r.get("status") == "sliced":
            status = "sliced-" + ("PASS" if r.get("hash_match") else "FAIL")
        else:
            status = r.get("status") or (
                "PASS" if r.get("hash_match") else "FAIL"
            )
        print(
            f"{name}: {status}"
            + (
                f" (spark {r.get('spark_s')}s, oracle {r.get('oracle_s')}s)"
                if "oracle_s" in r
                else ""
            ),
            flush=True,
        )

    summary = {
        "sf_dir": sf_dir,
        "pass": n_pass,
        "fail": n_fail,
        "other": n_other,
        "total": len(results),
    }
    print(json.dumps(summary))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
