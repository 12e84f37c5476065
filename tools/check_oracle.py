"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at a given sf dir and compares row count,
column names, and order-insensitive values against ``oracle_sql()`` in
DuckDB.  Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows):
    def conv(v):
        if isinstance(v, float):
            return round(v, 9)
        return v

    return sorted(tuple(conv(v) for v in r) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from osm_cut_spark.session import get_session

    spark = get_session(app_name="oracle_check", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []

    # Gate hygiene: ngram_jaccard / cosine_dup compare a deterministic
    # id < ORACLE_ID_CAP window (keeps their quadratic oracles feasible at
    # every sf).  Assert the window is NON-TRIVIAL at this sf so a future
    # table-shape change can't silently turn those two rows into no-ops —
    # and say out loud when the window is a strict subset of the corpus.
    MIN_WINDOW_ROWS = 100
    if not only or {"ngram_jaccard", "cosine_dup"} & only:
        cap = entry.ORACLE_ID_CAP
        for tbl, idc, qname in (
            ("documents", "doc_id", "ngram_jaccard"),
            ("embeddings", "vec_id", "cosine_dup"),
        ):
            n_win, n_all = con.sql(
                f"SELECT count(*) FILTER ({idc} < {cap}), count(*) FROM {tbl}"
            ).fetchone()
            if n_win < MIN_WINDOW_ROWS:
                failures.append(
                    (qname, f"ORACLE_ID_CAP window trivial: {n_win} rows of {tbl}")
                )
                print(
                    f"FAIL  {qname}: ORACLE_ID_CAP={cap} window matches only "
                    f"{n_win} {tbl} rows (< {MIN_WINDOW_ROWS}) — the oracle row is a no-op"
                )
            elif n_win < n_all:
                print(
                    f"NOTE  {qname}: validates a capped id<{cap} window "
                    f"({n_win}/{n_all} {tbl} rows) at this sf — full-corpus "
                    f"scale path is the minhash/LSH family"
                )
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            spark_rows = df.collect()
            spark_cols = df.columns
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(spark_rows)} rows (no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_rows = rel.fetchall()
            duck_cols = [d[0] for d in rel.description]
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount {len(spark_rows)} vs {len(duck_rows)}")
        if [c.lower() for c in spark_cols] != [c.lower() for c in duck_cols]:
            problems.append(f"columns {spark_cols} vs {duck_cols}")
        sn, dn = normalize([tuple(r) for r in spark_rows]), normalize(duck_rows)
        if sn != dn:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            extra_s = [r for r in sn if r not in set(map(tuple, dn))][:3]
            extra_d = [r for r in dn if r not in set(map(tuple, sn))][:3]
            problems.append(f"values differ; first diffs={diff} onlyspark={extra_s} onlyduck={extra_d}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name}: {len(spark_rows)} rows")
    print()
    if failures:
        print(f"{len(failures)} FAILURES:", [f[0] for f in failures])
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
