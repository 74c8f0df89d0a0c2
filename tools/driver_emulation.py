"""Driver-contract emulation: exactly what the external verifier does.

Builds a PLAIN SparkSession (local[8], NOT the engine's session factory —
the driver hands us an arbitrary session and __spark_entry__._wrap must
repin the correctness confs itself), imports /root/repo/__spark_entry__,
smoke-runs entry(spark), then for each named query runs the Spark plan at
sf0.01 and compares against oracle_sql() executed in DuckDB over the same
parquet: row count + sorted-column schema + order-insensitive value hash
with repr() floats (bit-exact — no tolerance).

Usage:
  python tools/driver_emulation.py <query> [query ...]
  python tools/driver_emulation.py --prefix N     # first N registry queries
  python tools/driver_emulation.py --hostile ...  # adversarial session:
        timezone=America/New_York, shuffle.partitions=2 — results must
        still hash-match (the _wrap repin + UTC discipline gate)
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb

ROOT = Path(__file__).resolve().parents[1]
SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def build_spark(hostile: bool):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
    )
    if hostile:
        # deliberately WRONG confs — __spark_entry__._wrap must repin
        b = b.config("spark.sql.shuffle.partitions", "2").config(
            "spark.sql.session.timeZone", "America/New_York"
        )
    else:
        b = b.config("spark.sql.shuffle.partitions", "8").config(
            "spark.sql.legacy.parquet.nanosAsLong", "true"
        )
    return b.getOrCreate()


def canon(df) -> str:
    df = df.copy()
    for c in df.columns:
        df[c] = df[c].map(
            lambda v: repr(float(v)) if isinstance(v, float) else repr(v)
        )
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()


def main() -> int:
    hostile = "--hostile" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    spark = build_spark(hostile)
    sys.path.insert(0, str(ROOT))
    import __spark_entry__ as entrymod

    if "--prefix" in sys.argv:
        n = int(sys.argv[sys.argv.index("--prefix") + 1])
        names = list(entrymod.queries())[:n]
    else:
        names = args

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )

    ent = entrymod.entry(spark)
    print("entry rows:", ent.count(), "schema:", [f.name for f in ent.schema])

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    ok = True
    for n in names:
        sdf = qs[n](spark, SF).toPandas()
        odf = con.execute(osql[n]).fetchdf()
        rm = len(sdf) == len(odf)
        sm = sorted(sdf.columns) == sorted(odf.columns)
        hm = canon(sdf) == canon(odf) if (rm and sm) else False
        print(f"{n}: rows {len(sdf)}/{len(odf)} match={rm} schema={sm} hash={hm}")
        ok = ok and rm and sm and hm
    print("DRIVER-EMULATION", "OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
