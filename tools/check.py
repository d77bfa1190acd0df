#!/usr/bin/env python3
"""Local differential check mirroring the driver's DuckDB oracle gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB with views over <sfDir>'s tables,
then compares after sorting columns by name (as the driver does) and rows.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    import re as _re
    for name, sql in oracle.items():
        # every oracle needs a TOTAL ORDER BY — one outside any
        # parenthesized (window/subquery) context; strip parens first so
        # an OVER (ORDER BY ...) can't satisfy the check
        stripped, prev = sql, None
        while prev != stripped:
            prev = stripped
            stripped = _re.sub(r"\([^()]*\)", " ", stripped)
        if "ORDER BY" not in stripped.upper():
            print(f"WARN {name}: oracle SQL has no top-level ORDER BY (hash instability)")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        pq = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not pq:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({pq!r})").df()
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        # ARROW-LEVEL type compare — the driver's hash is dtype-sensitive
        # (q36 round 1: equal values, DECIMAL(28,2) vs DECIMAL(38,2), red).
        # pandas hides this (both sides decay to float/object), so compare
        # the physical arrow types and FAIL on skew. Only known-benign
        # diffs are normalized: timestamp tz (Spark stamps UTC, DuckDB
        # none — both store identical µs since epoch) and large_string.
        import pyarrow.parquet as _pq
        # q18/q37 intentionally mix date32 and timestamp encodings (Spark
        # INT96->ns, DuckDB us; date arithmetic yields dates in DuckDB,
        # timestamps in Spark) and were driver-green in round 1 — the
        # driver compares temporal VALUES. Only there are date and
        # timestamp collapsed to one class; everywhere else a date-vs-
        # timestamp skew FAILS.
        _temporal_ok = name in ("q18_scalar_dates", "q37_interval_arith")
        def _norm(t):
            s = str(t)
            s = s.replace(", tz=UTC", "").replace("large_string", "string")
            # nested-field NULLABILITY and child-field NAMES are arrow
            # metadata, not value-level properties (collect_list emits
            # non-null elements, DuckDB's list() nullable ones — the
            # value compare still catches actual null disagreements);
            # element TYPES stay compared (int32 vs int64 still fails)
            s = s.replace(" not null", "")
            s = __import__("re").sub(r"(list<)\w+(: )", r"\1item\2", s)
            if s.startswith("timestamp"):
                s = "datetime" if _temporal_ok else "timestamp"
            elif s.startswith("date"):
                s = "datetime" if _temporal_ok else "date"
            return s
        try:
            g_schema = _pq.read_table(pq).schema
            e_schema = con.sql(oracle[name]).arrow().schema
            g_types = {f.name: _norm(f.type) for f in g_schema}
            e_types = {f.name: _norm(f.type) for f in e_schema}
            if set(g_types) != set(e_types):
                print(f"FAIL {name}: arrow column sets differ: "
                      f"spark-only={sorted(set(g_types) - set(e_types))} "
                      f"oracle-only={sorted(set(e_types) - set(g_types))}")
                n_fail += 1; continue
            skew = [(c, g_types[c], e_types[c]) for c in sorted(g_types)
                    if g_types[c] != e_types[c]]
            if skew:
                print(f"FAIL {name}: arrow dtype skew {skew}")
                n_fail += 1; continue
        except Exception as e2:
            print(f"WARN {name}: arrow schema compare errored: {e2}")
        import pandas as pd
        g = got.reset_index(drop=True)
        e = exp.reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            # -0.0 == 0.0 passes every value comparator but the driver
            # hashes BYTES — a signed-zero skew is a red row there (the
            # r9/r10 p75 red: DuckDB round(-3.5e-7, 6) = -0.0, Spark's
            # BigDecimal rounding = +0.0). Compare sign bits explicitly.
            import numpy as _np
            for c in g.columns:
                if g[c].dtype.kind == "f" and e[c].dtype.kind == "f":
                    gz = _np.signbit(g[c].to_numpy()) & (g[c].to_numpy() == 0)
                    ez = _np.signbit(e[c].to_numpy()) & (e[c].to_numpy() == 0)
                    if (gz != ez).any():
                        k = int(_np.argmax(gz != ez))
                        raise AssertionError(
                            f"signed-zero skew in column {c} at row {k}: "
                            f"spark {'-0.0' if gz[k] else '0.0'} vs "
                            f"oracle {'-0.0' if ez[k] else '0.0'}")
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        except AssertionError as err:
            msg = str(err).split("\n")[0:6]
            print(f"FAIL {name}: {' | '.join(msg)}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
