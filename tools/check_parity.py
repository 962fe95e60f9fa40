"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir,
compare row count + schema + order-insensitive value hash.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def value_hash(rows: list[tuple], col_order: list[int]) -> str:
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in col_order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from logstash_filter_jdbc_static_spark import queries as q
    from logstash_filter_jdbc_static_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    failures = []
    for name, fn in q.queries().items():
        if only and name not in only:
            continue
        oracle = q.oracle_sql().get(name)
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if oracle is None:
            print(f"okay {name}: rows={len(srows)} (no oracle, rows-only)")
            continue
        try:
            cur = con.execute(oracle)
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            continue
        status = []
        if len(srows) != len(drows):
            status.append(f"rowcount {len(srows)} != {len(drows)}")
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            status.append(f"schema {sorted(scols)} != {sorted(dcols)}")
        else:
            s_order = [i for _, i in sorted((c.lower(), i) for i, c in enumerate(scols))]
            d_order = [i for _, i in sorted((c.lower(), i) for i, c in enumerate(dcols))]
            sh = value_hash(srows, s_order)
            dh = value_hash(drows, d_order)
            if sh != dh:
                status.append("value-hash mismatch")
                # print a few differing lines to debug
                sset = {"\x01".join(norm_cell(r[i]) for i in s_order) for r in srows}
                dset = {"\x01".join(norm_cell(r[i]) for i in d_order) for r in drows}
                for line in list(sset - dset)[:3]:
                    print(f"    spark-only: {line.replace(chr(1), ' | ')}")
                for line in list(dset - sset)[:3]:
                    print(f"    duck-only:  {line.replace(chr(1), ' | ')}")
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"PASS {name}: rows={len(srows)}")
    print(f"\n{len(failures)} failures" if failures else "\nall queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
