#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB with the sfDir tables registered
as views, and compares: schema (column names), RESULT TYPES (the driver's
hash is type-sensitive — an uncast DuckDB integer sum() is HUGEINT and fails
the driver even when every value matches; see round-3 q57/q59), row count,
and cell values (columns sorted by name, rows sorted). Exits nonzero on any
mismatch.

Dev-only tooling — never shipped in the library jar.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for r in rows:
        out.append(tuple(x.isoformat() if hasattr(x, "isoformat") else x for x in r))
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            # (name, type) pairs, NOT a dict: duplicate output column names
            # would silently collapse to one dict entry and let a type
            # mismatch on the shadowed duplicate escape the strict check
            got_types = sorted(zip(got.columns, (str(t) for t in got.types)))
            got_rows = canon(got.select(", ".join(f'"{c}"' for c in got_cols)).fetchall())
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_types = sorted(zip(exp.columns, (str(t) for t in exp.types)))
            exp_rows = canon(exp.select(", ".join(f'"{c}"' for c in exp_cols)).fetchall())
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            failed.append(name)
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            failed.append(name)
            continue
        # Type strictness: the driver's hash distinguishes e.g. HUGEINT from
        # BIGINT, so the local gate must too. Both sides are read through the
        # same DuckDB type system (parquet scan vs native query), so any
        # divergence here is a real oracle-vs-engine typing mismatch.
        type_bad = [(g, e) for g, e in zip(got_types, exp_types) if g != e]
        if type_bad:
            for g, e in type_bad:
                print(f"FAIL {name}: column type spark={g} != oracle={e}")
            failed.append(name)
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            failed.append(name)
            continue
        bad = 0
        for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
            if g != e:
                bad += 1
                if bad <= 3:
                    close = all(
                        (isinstance(a, float) and isinstance(b, float)
                         and (math.isclose(a, b, rel_tol=1e-9) or (math.isnan(a) and math.isnan(b))))
                        or a == b
                        for a, b in zip(g, e))
                    print(f"FAIL {name} row {i}{' (float-close)' if close else ''}:\n  got {g}\n  exp {e}")
        if bad:
            print(f"FAIL {name}: {bad}/{len(got_rows)} rows differ")
            failed.append(name)
        else:
            print(f"OK   {name} ({len(got_rows)} rows)")
    if failed:
        print(f"\n{len(failed)} failed: {failed}")
        sys.exit(1)
    print("\nall queries match")


if __name__ == "__main__":
    main()
