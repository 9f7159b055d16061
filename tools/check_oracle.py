#!/usr/bin/env python3
"""Dev-loop oracle checker mirroring the driver's t2 correctness gate:
for each query output written by graft.Verify, run the corresponding
oracle SQL in DuckDB over the same testdata tables and compare twice:

1. tolerant: columns sorted by name, rows sorted, values compared with
   a tiny float tolerance (catches semantic differences);
2. strict: the driver's actual pandas hash compare
   (pd.util.hash_pandas_object over column- and row-sorted frames).
   This is dtype-sensitive for int-vs-float — the DuckDB HUGEINT class
   of bug (sum/count_if of integers) that the tolerant compare misses —
   but, matching observed driver behavior, datetime columns are
   normalized to a common unit first (ns-vs-us differences pass the
   real driver; q13/q47 precedent).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import glob as globmod
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    def key(t):
        return tuple((x is None, str(x)) for x in t)
    return sorted(cols), sorted(out, key=key)


def values_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)


def strict_hash_eq(spark_glob, want_df):
    """The driver's compare: sort columns by name, sort rows, hash."""
    got_df = pd.concat([pd.read_parquet(f) for f in globmod.glob(spark_glob)],
                       ignore_index=True)

    def norm(df):
        import datetime
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime64"):
                df[c] = df[c].astype("datetime64[us]")
            elif df[c].dtype == object:
                v = df[c].dropna()
                # Spark DATE columns arrive as datetime.date objects;
                # DuckDB DATE arrives as midnight datetime64 — align
                # (the real driver passes such queries, q52 precedent)
                if len(v) and isinstance(v.iloc[0], datetime.date) \
                        and not isinstance(v.iloc[0], datetime.datetime):
                    df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    g, w = norm(got_df), norm(want_df)
    if list(g.columns) != list(w.columns) or len(g) != len(w):
        return False
    hg = pd.util.hash_pandas_object(g, index=False).sum()
    hw = pd.util.hash_pandas_object(w, index=False).sum()
    return hg == hw


def main(sf_dir, out_dir, timeout_s=0, only=None, json_out=None,
         threads=0):
    import threading
    import time
    con = duckdb.connect()
    import os
    if threads:
        # sharded sweeps: cap per-process threads so N concurrent
        # checkers divide the cores instead of each grabbing all of
        # them (6x32 threads on 32 cores ran the heavy oracles 6x slow)
        con.sql(f"SET threads = {int(threads)}")
    for t in TABLES:
        # driver testdata ships single files; Spark-derived scale
        # corpora (tools/Scale10xRel) write directories of part files
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p += "/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        pfx = only.split(",")
        oracle = {k: v for k, v in oracle.items()
                  if any(k.startswith(p) for p in pfx)}
    ledger = {}
    n_pass = n_fail = 0

    def note(name, status, rows, secs, detail=""):
        ledger[name] = {"status": status, "rows": rows,
                        "oracle_secs": round(secs, 2), "detail": detail}

    # outputs beyond this row count never enter python: the compare
    # runs as an order-free in-DuckDB digest (count + sum of row
    # hashes over name-sorted columns on BOTH sides) — same-engine,
    # dtype-sensitive, bounded memory. 157M-row q73@sf1 precedent:
    # fetchall+python-sort of such outputs is an un-interruptible OOM.
    big_rows = 2_000_000

    # DuckDB's hash() is width-insensitive (hash(1::INT)=hash(1::BIGINT))
    # and int-vs-float-insensitive for whole numbers, so the digest
    # compares the TYPED schema too — collapsed to the same dtype
    # classes the strict pandas compare distinguishes (pandas hashes
    # int32/int64 identically but int-vs-float differently; datetimes
    # are unit-normalized there, so all temporal types share a class).
    def dtype_class(t):
        u = t.upper()
        if u in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                 "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
            return "int"
        if u == "HUGEINT":
            # pandas renders HUGEINT lossily (object/float), so a
            # missing CAST on a sum must FAIL against a BIGINT column
            return "hugeint"
        if u in ("FLOAT", "DOUBLE") or u.startswith("DECIMAL"):
            return "float"
        if u == "DATE" or u.startswith("TIMESTAMP") or u.startswith("TIME"):
            return "ts"
        return u

    def digest(rel_sql):
        desc = con.sql(f"DESCRIBE SELECT * FROM ({rel_sql})").fetchall()
        schema = sorted((r[0], dtype_class(r[1])) for r in desc)
        collist = ", ".join(f'"{c}"' for c, _ in schema)
        # two independent commutative channels (sum + bit_xor of row
        # hashes): a multiset difference must cancel in BOTH to pass
        q = (f"SELECT count(*) AS c, sum(CAST(hash({collist}) AS HUGEINT)) AS h, "
             f"bit_xor(hash({collist})) AS x "
             f"FROM ({rel_sql})")
        c, h, x = con.sql(q).fetchall()[0]
        return schema, c, (h, x)

    for name in sorted(oracle):
        sql = oracle[name]
        t0 = time.monotonic()
        # watchdog: a runaway oracle (the q186 cubic-join class) is
        # interrupted rather than hanging the whole protocol run
        timer = None
        if timeout_s:
            timer = threading.Timer(timeout_s, con.interrupt)
            timer.start()
        try:
            got_src = f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
            n_out = con.sql(f"SELECT count(*) FROM ({got_src})").fetchall()[0][0]
            if n_out > big_rows:
                gc, gn, gh = digest(got_src)
                wc, wn, wh = digest(sql)
                secs = time.monotonic() - t0
                if gc != wc:
                    print(f"FAIL {name}: columns {gc} != {wc}")
                    note(name, "schema_mismatch", n_out, secs)
                    n_fail += 1
                elif gn != wn:
                    print(f"FAIL {name}: rows {gn} != {wn}")
                    note(name, "rows_mismatch", n_out, secs)
                    n_fail += 1
                elif gh != wh:
                    print(f"FAIL {name}: in-db row-hash digest differs")
                    note(name, "hash_mismatch", n_out, secs)
                    n_fail += 1
                else:
                    print(f"PASS {name} ({gn} rows, in-db digest, oracle {secs:.1f}s)")
                    note(name, "pass", gn, secs, "in-db digest (rows>2M)")
                    n_pass += 1
                continue
            got_rel = con.sql(got_src)
            got_cols, got_rows = canon(got_rel.fetchall(), got_rel.columns)
            want_rel = con.sql(sql)
            want_cols, want_rows = canon(want_rel.fetchall(), want_rel.columns)
        except Exception as e:
            secs = time.monotonic() - t0
            kind = "TIMEOUT" if timeout_s and secs >= timeout_s - 1 else "FAIL"
            print(f"{kind} {name}: exception {e} ({secs:.1f}s)")
            note(name, "oracle_timeout" if kind == "TIMEOUT" else "error",
                 None, secs, str(e)[:200])
            n_fail += 1
            continue
        finally:
            if timer:
                timer.cancel()
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}")
            note(name, "schema_mismatch", len(got_rows), time.monotonic() - t0)
            n_fail += 1
            continue
        if len(got_rows) != len(want_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(want_rows)}")
            note(name, "rows_mismatch", len(got_rows), time.monotonic() - t0)
            n_fail += 1
            continue
        bad = None
        for i, (g, w) in enumerate(zip(got_rows, want_rows)):
            if not all(values_eq(a, b) for a, b in zip(g, w)):
                bad = (i, g, w)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}\n  got  {bad[1]}\n  want {bad[2]}")
            note(name, "value_mismatch", len(got_rows), time.monotonic() - t0,
                 f"row {bad[0]}")
            n_fail += 1
            continue
        timer = threading.Timer(timeout_s, con.interrupt) if timeout_s else None
        if timer:
            timer.start()
        try:
            strict = strict_hash_eq(f"{out_dir}/{name}/*.parquet",
                                    con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: strict-hash exception {e}")
            note(name, "error", len(got_rows), time.monotonic() - t0,
                 f"strict-hash: {str(e)[:200]}")
            n_fail += 1
            continue
        finally:
            if timer:
                timer.cancel()
        secs = time.monotonic() - t0
        if not strict:
            print(f"FAIL {name}: values equal but pandas hash differs "
                  "(dtype mismatch — check HUGEINT casts / serialization)")
            note(name, "hash_mismatch", len(got_rows), secs)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows, oracle {secs:.1f}s)")
            note(name, "pass", len(got_rows), secs)
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(ledger, f, indent=1, sort_keys=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--"))
    sys.exit(main(args[0], args[1],
                  timeout_s=int(opts.get("timeout", "0")),
                  only=opts.get("only"),
                  json_out=opts.get("json"),
                  threads=int(opts.get("threads", "0"))))
