"""Simulate the driver: plain SparkSession, import __spark_entry__,
smoke entry(), then run every queries() entry at sf0.01 against
oracle_sql() in DuckDB — value-level comparison like CORRECTNESS_r{N}."""
import sys

sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as e

# Plain session, as the driver would build it — none of our engine confs.
spark = SparkSession.builder.master("local[8]").getOrCreate()

df = e.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) > 0

qs, osql = e.queries(), e.oracle_sql()
print(f"queries: {len(qs)}, oracles: {len(osql)}")

sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

from hana_bq_beam_connector_spark.operators._common import (  # noqa: E402
    release_session_pins,
)

fails = []
for name, fn in sorted(qs.items()):
    release_session_pins()  # drop frames pinned by the previous query
    sdf = fn(spark, sf)
    scols = sorted(sdf.columns)
    srows = sorted([tuple(str(r[c]) for c in scols) for r in sdf.collect()])
    if name in osql:
        rel = con.execute(osql[name])
        ocols_raw = [d[0] for d in rel.description]
        idx = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
        ocols = [ocols_raw[i] for i in idx]
        orows = sorted([tuple(str(r[i]) for i in idx) for r in rel.fetchall()])
        ok = scols == ocols and srows == orows
        print(f"{'OK  ' if ok else 'FAIL'} {name}: spark={len(srows)} oracle={len(orows)}")
        if not ok:
            fails.append(name)
            for a, b in list(zip(srows, orows))[:3]:
                if a != b:
                    print("   spark:", a, "\n   oracle:", b)
    else:
        print(f"ROWS {name}: {len(srows)} rows")
print("RESULT:", "ALL MATCH" if not fails else f"FAILURES: {fails}")
sys.exit(1 if fails else 0)
