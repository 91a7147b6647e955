"""Local mirror of the driver's correctness gate: run EVERY
``__spark_entry__.queries()`` entry and its DuckDB oracle side-by-side
at a chosen scale factor and report mismatches, using the same
pandas-path normalization as the driver's value-hash compare (so type
widenings like HUGEINT -> float64 are caught here first).

Usage: python tools/correctness_mirror.py [sf_dir] [master] [only]
       (defaults: /root/testdata/sf0.01, local[16], all queries;
        ``only`` is a comma-separated subset of query names)
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        v = v.item()
    if v is not None and type(v).__name__ == "Timestamp":
        v = v.to_pydatetime()
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.6f}"
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return str(v)


def main() -> int:
    import duckdb

    import __spark_entry__ as e
    from ilogtail_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    master = sys.argv[2] if len(sys.argv) > 2 else "local[16]"
    spark = get_spark(app_name="correctness_mirror", master=master)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
        qs = {k: v for k, v in qs.items() if k in only}
    bad: list[str] = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
            oracle = oracles.get(name)
            if oracle is None:
                print(f"{name}: rows-only ({len(srows)} rows)")
                continue
            pdf = con.execute(oracle).fetch_df()
            drows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            dorder = sorted(
                range(len(pdf.columns)), key=lambda i: list(pdf.columns)[i]
            )
            sk = sorted(tuple(norm(r[i]) for i in order) for r in srows)
            dk = sorted(tuple(norm(r[i]) for i in dorder) for r in drows)
            ok = (
                len(srows) == len(drows)
                and sorted(scols) == sorted(pdf.columns)
                and sk == dk
            )
            if not ok:
                bad.append(name)
                diff = [(a, b) for a, b in zip(sk, dk) if a != b][:3]
                print(f"MISMATCH {name}: {len(srows)} vs {len(drows)}; {diff}")
        except Exception as ex:  # noqa: BLE001 - report and continue
            bad.append(name)
            print(f"ERROR {name}: {ex!r}"[:300])
    print(f"TOTAL {len(qs)}  BAD {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
