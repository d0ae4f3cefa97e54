"""Local emulation of the driver's CORRECTNESS gate.

Runs every __spark_entry__.queries() entry and its oracle_sql() side-by-side
at a given sf dir, compares row counts, schemas (column names sorted), and a
dtype-sensitive value hash — the same comparison shape the driver applies.

Usage: python tools/check_driver.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import json
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    payload = pdf.to_csv(index=False, float_format="%.6g").encode()
    dtypes = ",".join(str(t) for t in pdf.dtypes)
    return hashlib.md5(payload).hexdigest()[:12] + "|" + dtypes


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from hdtspark.session import get_spark

    spark = get_spark(app_name="check-driver", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"spark: {e}"}
            print(f"ERR   {name}: spark: {e}")
            continue
        if name not in osql:
            results[name] = {"spark_rows": len(sdf), "err": "no_oracle"}
            print(f"WEAK  {name}: no_oracle rows={len(sdf)}")
            continue
        try:
            odf = con.sql(osql[name]).df()
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"oracle: {e}"}
            print(f"ERR   {name}: oracle: {e}")
            continue
        rows = len(sdf) == len(odf)
        schema = sorted(sdf.columns) == sorted(odf.columns)
        sh, oh = value_hash(sdf), value_hash(odf)
        hmatch = sh == oh
        ok = rows and schema and hmatch
        results[name] = {"rows_match": rows, "schema_match": schema,
                         "hash_match": hmatch, "spark_rows": len(sdf),
                         "oracle_rows": len(odf)}
        tag = "OK  " if ok else "FAIL"
        print(f"{tag}  {name}: rows {len(sdf)}/{len(odf)} schema={schema} "
              f"hash={hmatch}")
        if not ok and len(sdf) < 50:
            print("  spark:", sh)
            print("  oracle:", oh)

    n_ok = sum(1 for r in results.values()
               if r.get("rows_match") and r.get("schema_match")
               and r.get("hash_match"))
    print(f"\n{n_ok}/{len(results)} green")
    with open("/tmp/check_driver.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
