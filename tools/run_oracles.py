#!/usr/bin/env python
"""Driver-contract simulation: run every ``__spark_entry__.queries()``
entry on a FRESH default-config SparkSession (the grading driver does
not use the repo's tuned session) and compare against the
``oracle_sql()`` text executed by DuckDB over the same parquet —
sorted-row equality after per-cell normalization (the driver compares
rows + schema + a value hash; cell-exact equality is the conservative
superset).

Usage: python tools/run_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import glob
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style value normalization: floats compared at 9
        # significant digits (queries round their own floats anyway)
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(rows):
    return sorted(tuple(_norm_cell(c) for c in r) for r in rows)


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("oracle-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            if os.path.isdir(p)
            else f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')"
        )
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = _norm_rows([tuple(r) for r in sdf.collect()])
            orows = _norm_rows(con.execute(oracles[name]).fetchall())
            ok = srows == orows
            if not ok:
                failures += 1
                diff_a = [r for r in srows if r not in set(orows)][:3]
                diff_b = [r for r in orows if r not in set(srows)][:3]
                print(
                    json.dumps(
                        {
                            "query": name,
                            "ok": False,
                            "spark_rows": len(srows),
                            "oracle_rows": len(orows),
                            "spark_only": [str(x) for x in diff_a],
                            "oracle_only": [str(x) for x in diff_b],
                        }
                    ),
                    flush=True,
                )
            else:
                print(
                    json.dumps({"query": name, "ok": True, "rows": len(srows)}),
                    flush=True,
                )
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            failures += 1
            print(json.dumps({"query": name, "ok": False, "err": repr(e)[:300]}), flush=True)
    print(json.dumps({"failures": failures}))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
