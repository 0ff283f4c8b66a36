#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle SQL and compare (sorted rows, sorted columns,
1e-9 tolerance on floats). Usage: selfcheck.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def sort_key_cell(x):
    # Floats sort on a key rounded MORE COARSELY than the 1e-9 comparison
    # tolerance, so sub-tolerance float noise cannot reorder rows differently
    # on the Spark vs oracle side (which would misalign the positional zip).
    if isinstance(x, float):
        return (x is None, 1, "", round(x, 6))
    return (x is None, 0, str(x), 0.0)


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple(sort_key_cell(x) for x in t))
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            ores = con.execute(sql)
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            sres = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = [d[0] for d in sres.description]
            srows = sres.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1
            continue
        # Type-strict gate: the driver hashes TYPED values, so a DuckDB
        # HUGEINT oracle vs a Spark BIGINT parquet column fails remotely
        # even when every value compares equal (round-4 q12). Compare the
        # DuckDB-described column types of both sides before the value pass.
        otypes = dict(r[:2] for r in con.execute(f"DESCRIBE {sql}").fetchall())
        stypes = dict(r[:2] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        ).fetchall())
        tbad = [(c, stypes[c], otypes[c]) for c in sorted(otypes)
                if stypes.get(c) != otypes[c]]
        if tbad:
            detail = ", ".join(f"{c}: spark={st} oracle={ot}"
                               for c, st, ot in tbad)
            print(f"FAIL {name}: column type mismatch ({detail})")
            n_fail += 1
            continue
        a, b = norm(srows, scols), norm(orows, ocols)
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}")
            n_fail += 1
            continue
        # Compare run-by-run over equal sort keys: the key is rounded more
        # coarsely (6 dp) than the 1e-9 tolerance, so two genuinely different
        # rows can share a key — within such a run the engines may order rows
        # differently (stable-sort arrival order), so match the run as a
        # MULTISET with the tolerance check instead of strictly positionally.
        def row_close(x, y):
            return len(x) == len(y) and all(
                (isinstance(u, float) and isinstance(v, float)
                 and math.isclose(u, v, rel_tol=1e-9, abs_tol=1e-9))
                or u == v
                for u, v in zip(x, y))

        ka = [tuple(sort_key_cell(c) for c in r) for r in a]
        bad = None
        i = 0
        while i < len(a) and bad is None:
            j = i
            while j < len(a) and ka[j] == ka[i]:
                j += 1
            remaining = list(b[i:j])
            for x in a[i:j]:
                m = next((t for t, y in enumerate(remaining)
                          if row_close(x, y)), None)
                if m is None:
                    bad = (i, x, remaining)
                    break
                remaining.pop(m)
            i = j
        if bad:
            # bad[2] holds the still-unmatched oracle rows sharing this
            # spark row's sort key — none matched within tolerance (an
            # empty list means the oracle's equal-key run was shorter)
            cands = "\n".join(f"  duck?={r}" for r in bad[2][:3]) or \
                "  (no oracle rows left under this sort key)"
            print(f"FAIL {name}: spark row at sorted position {bad[0]} has no "
                  f"tolerant match among {len(bad[2])} same-key oracle rows:\n"
                  f"  spark={bad[1]}\n{cands}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
