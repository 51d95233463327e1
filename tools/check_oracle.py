#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle (oracle_sql.json) on the same sf dir.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--skip-n2]

--skip-n2 excludes the oracles whose DUCKDB side is quadratic (exact
pair-set cross joins / list-intersection self-joins) — the Spark side of
every one of them is sub-quadratic, it is only the oracle formulation
that can't scale. This is the sf0.1 gate tier: everything else must
still be green at 10x the regular gate SF.
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# EMPTY since r17 (VERDICT r16 item 3): the jaccard-family oracles were
# rewritten in inverted-index form (intersection size = shared-shingle
# equi-join row count — 567 s -> 1.4 s at sf0.1), the edit-distance
# oracle length-bucket + char-histogram blocked (328 s -> 8.7 s), the
# streaming-ingest accept chain's NOT EXISTS layers count-joined, and
# the remaining ten rows (embedding/ANN/decontaminate) measured
# sub-3 s at sf0.1 as they stood. The FULL row set (280 as of r18; see
# README's gate history for the current count) gates at sf0.1 with 0
# skipped. --skip-n2 is kept as a no-op flag so documented invocations
# keep working.
N2_ORACLES = set()


def canon(rows, cols):
    """Sort columns by name, then rows; normalize floats/None."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        return repr(v)

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main(sf_dir, out_dir, skip_n2=False):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    skipped = [n for n in sorted(oracle) if skip_n2 and n in N2_ORACLES]
    for n in skipped:
        print(f"SKIP {n} (n^2 oracle, excluded at this tier)")
    for name in sorted(n for n in oracle if n not in skipped):
        sql = oracle[name]
        try:
            want = con.execute(sql)
            wcols = [d[0] for d in want.description]
            wrows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        # HUGEINT guard: DuckDB SUM(BIGINT) widens to HUGEINT, which the
        # driver's typed hash distinguishes from Spark's BIGINT even when
        # every value is identical (repr-based compares can't see it —
        # the r13 corpus_diff/pca/concentration lesson). Force the
        # convention: CAST every SUM-derived output AS BIGINT.
        try:
            huge = [r[0] for r in con.execute(
                f"DESCRIBE SELECT * FROM ({sql})").fetchall()
                if "HUGEINT" in r[1]]
            if huge:
                print(f"FAIL {name}: HUGEINT oracle columns {huge} — "
                      f"wrap in CAST(... AS BIGINT)")
                n_fail += 1
                continue
        except Exception:
            pass
        try:
            got = duckdb.connect().execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        wc, wr = canon(wrows, wcols)
        gc, gr = canon(grows, gcols)
        if wc != gc:
            print(f"FAIL {name}: columns differ: spark={gc} oracle={wc}")
            n_fail += 1
        elif wr != gr:
            diffs = [i for i, (a, b) in enumerate(zip(wr, gr)) if a != b]
            print(f"FAIL {name}: rows differ (spark={len(gr)}, oracle={len(wr)},"
                  f" first diffs {diffs[:3]})")
            for i in diffs[:2]:
                print(f"   oracle[{i}]={wr[i]}")
                print(f"   spark [{i}]={gr[i]}")
            if len(wr) != len(gr):
                print(f"   oracle head: {wr[:2]}  spark head: {gr[:2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    skip_note = f", {len(skipped)} skipped (n^2 oracle)" if skipped else ""
    print(f"== {n_pass} pass, {n_fail} fail{skip_note} ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], "--skip-n2" in sys.argv[3:]))
