"""Cold driver-contract verification (the verify skill's gate #1).

Mimics the grading driver: plain SparkSession (NO engine conf), entry()
smoke, then every queries() entry vs its oracle_sql() in DuckDB at sf0.01 —
rows + schema(column names) + order-insensitive value hash.

Usage: python scripts/verify_driver.py [--json PATH] [--all] [--canary] [sf_dir] [query_prefix ...]

--json PATH  additionally write a machine-readable artifact (one record
             per query: rows/schema/hash match, row count, seconds, mode)
--all        verify the FULL registry (driver-facing composites AND the
             folded singles) instead of the 50-entry driver view
--canary     after the sweep, run the bench's pinned 8-query canary set
             in a fresh isolated session and record the minima in the
             artifact (canary / canary_total keys) — makes cross-round
             sweep-wall drift attributable to host load mechanically
"""

from __future__ import annotations

import hashlib
import importlib.util
import json
import math
import sys
import time

import duckdb

_args = sys.argv[1:]
JSON_PATH = None
ALL = False
if "--json" in _args:
    i = _args.index("--json")
    JSON_PATH = _args[i + 1]
    del _args[i : i + 2]
if "--all" in _args:
    ALL = True
    _args.remove("--all")
CANARY = False
if "--canary" in _args:
    CANARY = True
    _args.remove("--canary")
SF_DIR = _args[0] if _args else "/root/testdata/sf0.01"
ONLY = _args[1:]

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sys.path.insert(0, "/root/repo")
    spec = importlib.util.spec_from_file_location("entry_mod", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )

    res = mod.entry(spark)
    n = len(res.collect())
    print(f"entry() smoke: {n} rows", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    if ALL:
        from snowplow_s3_loader_spark.plans.composites import ORACLES_ALL, QUERIES_ALL

        qs, osql = dict(QUERIES_ALL), dict(ORACLES_ALL)
    else:
        qs, osql = mod.queries(), mod.oracle_sql()
    failures = []
    records = {}
    for name, fn in sorted(qs.items()):
        if ONLY and not any(name.startswith(p) for p in ONLY):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            records[name] = {"mode": "error", "error": f"{type(e).__name__}: {str(e)[:200]}"}
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        if name not in osql:
            records[name] = {
                "mode": "rows_only", "n_rows": len(srows),
                "seconds": round(time.time() - t0, 2),
            }
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)", flush=True)
            continue
        try:
            cur = con.execute(osql[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            records[name] = {"mode": "error", "error": f"oracle: {str(e)[:200]}"}
            print(f"FAIL {name}: oracle error {str(e)[:200]}", flush=True)
            continue
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = schema_ok and value_hash(scols, srows) == value_hash(ocols, orows)
        records[name] = {
            "mode": "oracle", "rows_match": rows_ok, "schema_match": schema_ok,
            "hash_match": hash_ok, "n_rows": len(srows),
            "seconds": round(time.time() - t0, 2),
        }
        if rows_ok and schema_ok and hash_ok:
            print(f"ok   {name}: {len(srows)} rows ({time.time()-t0:.1f}s)", flush=True)
        else:
            failures.append(name)
            print(
                f"FAIL {name}: rows {len(srows)}/{len(orows)} schema_ok={schema_ok} "
                f"hash_ok={hash_ok} spark_cols={sorted(scols)} oracle_cols={sorted(ocols)}",
                flush=True,
            )
    print(f"\n{'ALL GREEN' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    spark.stop()
    canary = None
    if CANARY:
        # round 13 (VERDICT r12 #5): the sweep walls are host-exposed
        # numbers; record the same isolated canary minima the bench
        # carries so cross-round sweep-time drift divides out
        # mechanically (common-set ratio / canary-total ratio).
        import os

        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        from bench import run_canary

        canary = run_canary(SF_DIR)
        if canary:
            print(
                "canary:", json.dumps(canary),
                "total:", round(sum(canary.values()), 3),
            )
    if JSON_PATH:
        artifact = {
            "sf_dir": SF_DIR, "registry": "all" if ALL else "driver",
            "n_queries": len(records),
            "n_failures": len(failures), "queries": records,
        }
        if canary:
            artifact["canary"] = canary
            artifact["canary_total"] = round(sum(canary.values()), 3)
        with open(JSON_PATH, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"artifact: {JSON_PATH}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
