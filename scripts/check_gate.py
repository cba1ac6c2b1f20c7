"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
twin on DuckDB at the given sf dir, comparing row count, column names,
and an order-insensitive value hash (columns sorted by name, rows sorted).

Usage: python scripts/check_gate.py [sf_dir] [query_name ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from lucene_solr_spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8,
                      extra_conf={"spark.driver.memory": "8g"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(got)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        ok = True
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            ok = False
        elif [str(d) for d in g.dtypes] != [str(d) for d in e.dtypes]:
            # the DRIVER's value hash is dtype-sensitive (r01: two gates
            # hash-failed on DuckDB sum()->HUGEINT with equal values) —
            # surface dtype drift as a hard failure here too
            bad = [
                (c, str(g.dtypes[c]), str(e.dtypes[c]))
                for c in g.columns
                if str(g.dtypes[c]) != str(e.dtypes[c])
            ]
            print(f"FAIL {name}: dtypes differ (spark vs duckdb): {bad}")
            ok = False
        elif len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            ok = False
        else:
            try:
                pd.testing.assert_frame_equal(
                    g, e, check_dtype=False, check_exact=True
                )
            except AssertionError as err:
                print(f"FAIL {name}: values differ\n{str(err)[:500]}")
                ok = False
        if ok:
            print(f"PASS {name} ({len(g)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
            print("  spark:", g.head(3).to_dict("records"))
            print("  duck :", e.head(3).to_dict("records"))
    print(f"\n{n_pass} pass, {n_fail} fail, {len(qs)} total")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
