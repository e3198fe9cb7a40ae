#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
shipped library is pure Scala/Spark; this script just pre-verifies oracle
parity before the driver runs the real check).

Usage: python3 tools/check.py <sfDir> <outDir>

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran, so
<outDir> holds one parquet dir per query plus oracle_sql.json. Runs each
oracle in DuckDB over views named after the tables, and compares with the
Spark result: columns sorted by name, rows sorted by all columns, exact
value equality (with a near-miss report for floats).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            # The driver's comparator (pandas sort_values -> factorize)
            # CRASHES on list/ndarray cells ("unhashable type"); mirror
            # that as a hard failure instead of tuple-converting, so a
            # query this gate passes cannot fail the real gate (q27 r1).
            bad = df[c].apply(
                lambda v: (isinstance(v, (list, tuple)) or
                           (hasattr(v, "tolist") and
                            not isinstance(v, (str, bytes)))))
            if bad.any():
                raise TypeError(
                    f"column '{c}' holds array values — the driver's "
                    "comparator cannot hash these; emit scalar columns")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
            g, w = norm(got), norm(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
                n_fail += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
                n_fail += 1
                continue
            if g.equals(w):
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
                continue
            # find the differing cells
            diffs = []
            for c in g.columns:
                a, b = g[c], w[c]
                neq = ~((a == b) | (a.isna() & b.isna()))
                if neq.any():
                    i = neq.idxmax()
                    diffs.append(f"{c}[{i}]: spark={a[i]!r} duck={b[i]!r} (n={neq.sum()})")
            print(f"FAIL {name}: {'; '.join(diffs[:4])}")
            n_fail += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {str(e).splitlines()[0][:200]}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail of {len(oracles)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
