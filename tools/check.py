#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
  1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran
  2. loads outDir/oracle_sql.json, runs each statement in DuckDB with views
     over the sfDir parquet tables
  3. compares rows (sorted by all columns, columns sorted by name) against
     the Spark parquet dump — exact equality, like the driver's hash check
  4. REPR pass (r11 lesson): reads the Spark parquet AGAIN via
     pyarrow→pandas (python objects, no DuckDB coercion) and diffs value
     REPRS against the DuckDB pandas fetch. The value-level compare in
     step 3 reads BOTH sides through DuckDB, so it is blind to read-path
     render divergence — r11's three hash-red queries (q_readability,
     q_sq8, q_table_digest) were value-identical but emitted
     decimal(38,x) columns that pyarrow renders as decimal.Decimal while
     DuckDB's pandas fetch coerces to float64. This pass flags that
     class before the driver does.
"""
import json
import math
import sys

import duckdb

try:
    import pyarrow.parquet as _pq
except Exception:  # pragma: no cover - pyarrow is present on the driver
    _pq = None


def _pyobj(v):
    """numpy scalar → python scalar; leave Decimal/str/bytes/None as-is.
    Dates normalize to ISO strings: DuckDB's pandas fetch promotes DATE
    to midnight Timestamp while pyarrow keeps datetime.date — a dtype
    artifact the driver's comparator also normalizes (r11's 5 date-typed
    queries were green), not a render divergence."""
    import datetime
    if hasattr(v, "item") and type(v).__module__.startswith("numpy"):
        v = v.item()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def repr_divergence(name, duck_df, spark_glob):
    """Return a message if the two read paths RENDER the (row/schema/
    value-identical) result differently — None when reprs agree."""
    if _pq is None:
        return None
    import glob as _glob
    frames = [_pq.read_table(f).to_pandas() for f in sorted(_glob.glob(spark_glob))]
    import pandas as pd
    pa_df = pd.concat(frames, ignore_index=True) if frames else None
    if pa_df is None:
        return f"{name}: no spark parquet files for repr pass"
    cols = sorted(duck_df.columns)
    if sorted(pa_df.columns) != cols:
        return f"{name}: repr pass column mismatch"
    a = sorted((tuple(_pyobj(v) for v in r)
                for r in duck_df[cols].itertuples(index=False)), key=repr)
    b = sorted((tuple(_pyobj(v) for v in r)
                for r in pa_df[cols].itertuples(index=False)), key=repr)
    bad = [(x, y) for x, y in zip(a, b) if repr(x) != repr(y)]
    if len(a) != len(b):
        return f"{name}: repr pass row count differ"
    if bad:
        return (f"{name}: {len(bad)} repr-divergent rows (duckdb-fetch vs "
                f"pyarrow read of the SAME values); first: duckdb={bad[0][0]!r} "
                f"pyarrow={bad[0][1]!r} — wide decimal / engine-specific "
                f"float render in the output schema?")
    return None

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Rows-only queries (no oracle SQL): the driver still requires rows>0.
    # Intersect with the executed-query manifest (queries.json) so stray
    # directories (checkpoints, _temporary, stale outputs) are not
    # miscounted as query results.
    import glob
    import os
    try:
        # An empty manifest is treated like a missing one: otherwise every
        # rows-only output would be SKIPped and the run could look green
        # with zero rows-only coverage.
        executed = set(json.load(open(f"{out_dir}/queries.json"))) or None
    except Exception:
        executed = None
    # A query that FAILED inside Verify writes no output directory at all
    # — without this check a rows-only query would be counted neither
    # pass nor fail and the run would look green while silently losing
    # coverage. Oracle-backed queries are excluded: the oracle loop below
    # already reports their missing output (no double-count).
    present = {os.path.basename(d.rstrip("/"))
               for d in glob.glob(f"{out_dir}/*/")}
    for name in sorted((executed or set()) - present - set(oracle)):
        print(f"FAIL {name}: executed but no output directory (Verify error?)")
        n_fail += 1
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle:
            continue
        if executed is not None and name not in executed:
            print(f"SKIP {name}: not in queries.json manifest")
            continue
        try:
            n = con.execute(f"SELECT count(*) FROM '{d}*.parquet'").fetchone()[0]
        except Exception as e:
            print(f"FAIL {name}: rows-only output unreadable: {e}")
            n_fail += 1
            continue
        if n > 0:
            print(f"PASS {name} (rows-only, {n} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows-only query returned 0 rows")
            n_fail += 1
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        wcols, gcols = sorted(want.columns), sorted(got.columns)
        if wcols != gcols:
            print(f"FAIL {name}: columns differ: oracle={wcols} spark={gcols}")
            n_fail += 1
            continue
        # The real driver comparator sorts a pandas frame; array/struct
        # cells make that raise (round-1 q_collect_* failed exactly so).
        # Reject them here even though this mimic's repr-sort would cope.
        bad_cols = [c for c in gcols if len(got) and not got[c].map(
            lambda v: not hasattr(v, "__len__") or isinstance(v, (str, bytes))).all()]
        if bad_cols:
            print(f"FAIL {name}: array-typed output columns {bad_cols} "
                  "(driver's pandas comparator cannot sort/hash them)")
            n_fail += 1
            continue
        w = sorted(
            (tuple(canon(v) for v in r) for r in want[wcols].itertuples(index=False)),
            key=repr)
        g = sorted(
            (tuple(canon(v) for v in r) for r in got[gcols].itertuples(index=False)),
            key=repr)
        if len(w) != len(g):
            print(f"FAIL {name}: row count differ: oracle={len(w)} spark={len(g)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(w, g) if repr(a) != repr(b)]
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: oracle={bad[0][0]} spark={bad[0][1]}")
            n_fail += 1
            continue
        # Values agree through DuckDB — now prove the two READ PATHS
        # render them identically (the driver hashes renders, not values).
        div = repr_divergence(name, got, f"{out_dir}/{name}/*.parquet")
        if div:
            print(f"FAIL {div}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(w)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
