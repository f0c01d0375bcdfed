#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's DuckDB oracle compare.

NOT part of the shipped library (the Scala engine has no Python
dependency) — this reproduces the driver's t2 gate locally so oracle
mismatches are caught before a round ends.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Emits a per-query oracle wall time ("OK   name: N rows  [0.42s]") and
FAILS any query whose DuckDB side alone exceeds ORACLE_BUDGET_S (60 s
at sf0.01): the engine has superlinear flags, and this is the gate's
equivalent — a single slow oracle row is what silently zeroed the
driver's CORRECTNESS_r17.json (q_quality_clf_drift's non-materialized
CTE chain cost ~10-15 min of DuckDB wall).
"""
import hashlib
import json
import os
import sys
import time

import duckdb

# Per-query DuckDB budget at sf0.01 (the driver's gate SF — the budget
# is only ENFORCED there; cross-SF dev runs still print timings). The
# whole 212-query pass must fit in single-digit minutes; one row over
# this means a CTE chain lost its MATERIALIZED hints (see SURVEY
# §2.8's q_whiten entry).
ORACLE_BUDGET_S = 60.0
GATE_SF_BASENAME = "sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def partsupp_glob(sf_dir):
    """Mirror of graft.Tables.partsuppPath: the derived partsupp for a
    scale-factor dir. The committed oracle SQL pins the sf0.01 path
    (the driver's gate always runs there); for cross-SF dev checks we
    substitute the requested dir's table - both engines must read the
    SAME files at whatever SF is under test."""
    # realpath, matching Tables.partsuppPath's getCanonicalPath — the
    # two sides must normalize identically or the digests disagree for
    # a non-canonical sfDir (e.g. /root/testdata/../testdata/sf0.01)
    f = os.path.realpath(sf_dir)
    digest = hashlib.md5(f.encode("utf-8")).hexdigest()[:8]
    return f"/root/repo/data/partsupp/{os.path.basename(f)}_{digest}/*.parquet"


# Type pairs that hash identically on the driver side (observed green
# across rounds): text-ish columns only. Numeric width differences
# (BIGINT vs HUGEINT) are exactly the class that shipped red in r13/r14,
# so they are NOT allowlisted.
TYPE_EQUIV = [{"VARCHAR", "JSON"}]


def type_compat(a, b):
    if a == b:
        return True
    return any(a in g and b in g for g in TYPE_EQUIV)


def col_types(con, sql):
    """name -> DuckDB column_type for an arbitrary query."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}


def norm(rows):
    out = []
    for r in rows:
        out.append(tuple("NULL" if v is None else
                         (repr(float(v)) if isinstance(v, float) else str(v))
                         for v in r))
    return sorted(out)


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    sf001_glob = partsupp_glob("/root/testdata/sf0.01")
    this_glob = partsupp_glob(sf_dir)
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        sql = sql.replace(sf001_glob, this_glob)
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            got_cols = [d[0] for d in con.description]
            t0 = time.monotonic()
            want = con.execute(sql).fetchall()
            oracle_s = time.monotonic() - t0
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            fail += 1
            continue
        # driver sorts columns by name before hashing values
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        wi = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} vs {sorted(want_cols)}")
            fail += 1
            continue
        # the driver's hash is type-sensitive (r13/r14 shipped red on a
        # stringified-equal BIGINT-vs-HUGEINT mismatch) — compare DESCRIBE
        # types, not just values
        try:
            gt = col_types(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            wt = col_types(con, f"({sql})")
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE exception {e}")
            fail += 1
            continue
        bad_types = [(c, gt[c], wt[c]) for c in gt
                     if c in wt and not type_compat(gt[c], wt[c])]
        if bad_types:
            print(f"FAIL {name}: type mismatch (spark vs oracle): {bad_types}")
            fail += 1
            continue
        g = norm([[r[i] for i in gi] for r in got])
        w = norm([[r[i] for i in wi] for r in want])
        enforce_budget = os.path.basename(
            os.path.realpath(sf_dir)) == GATE_SF_BASENAME
        if enforce_budget and oracle_s > ORACLE_BUDGET_S:
            print(f"FAIL {name}: oracle wall {oracle_s:.1f}s exceeds "
                  f"{ORACLE_BUDGET_S:.0f}s budget (values "
                  f"{'match' if g == w else 'MISMATCH'}) — "
                  f"materialize the shared CTEs (SURVEY §2.8 q_whiten)")
            fail += 1
            continue
        if g == w:
            print(f"OK   {name}: {len(g)} rows  [{oracle_s:.2f}s]")
            ok += 1
        else:
            print(f"FAIL {name}: {len(g)} vs {len(w)} rows")
            ws, gs = set(w), set(g)
            only_g = [r for r in g if r not in ws][:3]
            only_w = [r for r in w if r not in gs][:3]
            print(f"     spark-only: {only_g}")
            print(f"     duck-only:  {only_w}")
            fail += 1
    print(f"== {ok} ok, {fail} fail")
    return 1 if fail else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
