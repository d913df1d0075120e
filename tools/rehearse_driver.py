"""Full driver rehearsal: run every __spark_entry__ queries() entry
against its oracle_sql() on DuckDB views over the same parquet, at the
driver's own scale (sf0.01 by default) — the exact compare the driver
records in CORRECTNESS_r{N}.json (order-insensitive multiset of value
tuples with columns sorted by name, floats rounded to 9 digits).

The sf0.001 pytest harness (tests/test_oracle_parity.py) runs per-query
at the small fixture scale; this tool catches sf-dependent drift (cap
boundaries, tie-breaks that only materialize with more rows).

Usage: python tools/rehearse_driver.py [sf_dir] [key ...]
Exit 0 = all compared keys match.
"""

from __future__ import annotations

import importlib.util
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    sys.path.insert(0, str(REPO))
    import duckdb

    from warc2text_spark.plans.parity import rows_to_multiset
    from warc2text_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    spec = importlib.util.spec_from_file_location(
        "e", str(REPO / "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    queries, oracles = mod.queries(), mod.oracle_sql()

    spark = get_spark("rehearse", master="local[16]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"create view {t} as "
                        f"select * from read_parquet('{p}')")

    keys = only or list(queries)
    failed = []
    for key in keys:
        t0 = time.time()
        try:
            df = queries[key](spark, sf_dir)
            got = rows_to_multiset(df.columns,
                                   [tuple(r) for r in df.collect()])
            if key not in oracles:
                print(f"{key:24s} rows-only {len(got):7d}  "
                      f"{time.time() - t0:6.1f}s")
                continue
            res = con.execute(oracles[key])
            exp = rows_to_multiset([d[0] for d in res.description],
                                   res.fetchall())
            ok = got == exp
            if not ok:
                failed.append(key)
                diff = next((f"{a} != {b}" for a, b in zip(got, exp)
                             if a != b), f"rows {len(got)} vs {len(exp)}")
                print(f"{key:24s} MISMATCH  {diff[:160]}")
            else:
                print(f"{key:24s} ok {len(got):7d} rows  "
                      f"{time.time() - t0:6.1f}s")
        except Exception as exc:  # noqa: BLE001 — report and continue
            failed.append(key)
            print(f"{key:24s} ERROR {type(exc).__name__}: "
                  f"{str(exc)[:160]}")
    print(f"\n{len(keys) - len(failed)}/{len(keys)} green"
          + (f"; FAILED: {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
