"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry AND its oracle_sql() on sf0.01, compare
rows/schema/value-hash with column-name-sorted, order-insensitive
semantics. Usage: python tools/correctness_sweep.py [sf_dir]"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from jsi_spark.session import get_spark  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _norm(v):
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


def _key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    qs, oracles = E.queries(), E.oracle_sql()
    report = {}
    for name, fn in qs.items():
        entry = {}
        try:
            df = fn(spark, sf)
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
            entry["spark_rows"] = len(srows)
            if name not in oracles:
                entry["err"] = "no_oracle"
            else:
                cur = con.execute(oracles[name])
                ocols = [d[0] for d in cur.description]
                orows = cur.fetchall()
                entry["oracle_rows"] = len(orows)
                entry["rows_match"] = len(srows) == len(orows)
                entry["schema_match"] = sorted(scols) == sorted(ocols)
                entry["hash_match"] = (entry["schema_match"] and
                                       _key(srows, scols) == _key(orows, ocols))
        except Exception as e:  # noqa: BLE001
            entry["err"] = f"{type(e).__name__}: {e}"[:300]
        report[name] = entry
        flag = ("OK" if entry.get("hash_match")
                else entry.get("err", "MISMATCH"))
        print(f"{name:28s} {flag}", flush=True)
    bad = [n for n, e in report.items()
           if not e.get("hash_match") and e.get("err") != "no_oracle"]
    no_oracle = [n for n, e in report.items() if e.get("err") == "no_oracle"]
    print(json.dumps({"n": len(report), "bad": bad, "no_oracle": no_oracle}))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
