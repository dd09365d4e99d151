#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
runs each oracle SQL in DuckDB over the sf tables and compares with the
Spark result parquet dumped by graft.Verify.

Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # FULL precision: the driver's hash gate is bit-exact, so any
        # tolerance here hides real divergence (learned in round 1).
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return str(v.normalize())
    except Exception:
        pass
    import datetime
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort()
    return sorted(c for c in cols), out

def make_con(sf_dir):
    import os
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        sel = "*"
        if t == "events":
            # ScaleGen dirs round-trip ts through Spark's nanos-as-long
            # read, so they carry BIGINT nanos where the driver's data is
            # TIMESTAMP_NS; values are µs-precision so ns//1000 is
            # lossless and epoch_ns(ts) behaves identically.
            (ts_type,) = con.execute(
                f"SELECT typeof(ts) FROM read_parquet('{src}') LIMIT 1").fetchone()
            if ts_type == "BIGINT":
                sel = "* REPLACE (make_timestamp(ts // 1000) AS ts)"
        con.execute(f"CREATE VIEW {t} AS SELECT {sel} FROM read_parquet('{src}')")
    return con


def main(sf_dir, out_dir):
    import os
    con = make_con(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # optional query subset: --only q1,q2 (resume a long scale compare
    # after an interrupt without redoing finished queries)
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    results = {}
    import time as _time
    for name in sorted(glob.glob(f"{out_dir}/*/")):
        qname = name.rstrip("/").split("/")[-1]
        if only is not None and qname not in only:
            continue
        # progress heartbeat for multi-hour scale runs: stderr, flushed
        print(f"[{_time.strftime('%H:%M:%S')}] {qname} ...",
              file=sys.stderr, flush=True)
        spark_files = glob.glob(f"{name}/*.parquet")
        if not spark_files:
            # Verify writes an _ERROR.txt manifest for a failed query —
            # surface its first line instead of a bare sentinel
            err = ""
            try:
                with open(f"{name}/_ERROR.txt") as fh:
                    err = " " + fh.readline().strip()[:200]
            except OSError:
                pass
            results[qname] = "NO_SPARK_OUTPUT" + err
            continue
        srel = con.sql(f"SELECT * FROM read_parquet('{name}/*.parquet')")
        scols, srows = srel.columns, srel.fetchall()
        # Outputs must never carry DECIMAL: the driver gate stringifies the
        # Spark side as Decimal ("46.00") and the oracle side as float
        # ("46.0"), so equal values still hash-mismatch (round-1 lesson).
        dec_cols = [c for c, t in zip(srel.columns, srel.types)
                    if "DECIMAL" in str(t).upper()]
        if dec_cols:
            results[qname] = f"DECIMAL_OUTPUT_COLS {dec_cols}"
            continue
        if qname not in oracle:
            results[qname] = f"ROWS_ONLY({len(srows)})" + ("" if len(srows) else " EMPTY!")
            continue
        try:
            orel = con.sql(oracle[qname])
            ocols, orows = orel.columns, orel.fetchall()
        except Exception as e:
            if "Out of Memory" in str(e):
                # allocator poisoning from an EARLIER heavy oracle in the
                # same connection (r18: text_clean_boilerplate at sf3
                # failed a 2MB allocation with >100GB free after the
                # recursive dedup oracles ran; it passed in isolation) —
                # rebuild the connection and retry this query once
                try:
                    con.close()
                except Exception:
                    pass
                con = make_con(sf_dir)
                try:
                    orel = con.sql(oracle[qname])
                    ocols, orows = orel.columns, orel.fetchall()
                except Exception as e2:
                    results[qname] = f"ORACLE_SQL_ERROR: {e2}"
                    continue
            else:
                results[qname] = f"ORACLE_SQL_ERROR: {e}"
                continue
        sc, sr = canon(srows, scols)
        oc, orr = canon(orows, ocols)
        if sc != oc:
            results[qname] = f"SCHEMA_MISMATCH spark={sc} oracle={oc}"
        elif len(sr) != len(orr):
            results[qname] = f"ROWCOUNT_MISMATCH spark={len(sr)} oracle={len(orr)}"
        elif sr != orr:
            diffs = [i for i, (a, b) in enumerate(zip(sr, orr)) if a != b][:3]
            detail = "; ".join(f"row{i}: spark={sr[i]} oracle={orr[i]}" for i in diffs)
            results[qname] = f"VALUE_MISMATCH ({sum(1 for a,b in zip(sr,orr) if a!=b)} rows) {detail}"
        else:
            results[qname] = f"OK ({len(sr)} rows)" + (" EMPTY!" if not sr else "")
    # A declared oracle key with NO dump dir at all is a FAILURE, not a
    # skip: round 10 read 102/102 green while 17 queries silently wrote
    # nothing (the failed-query manifest in Verify makes this mostly a
    # backstop now). Skipped for declared-partial runs: Verify's
    # single-query `only` mode writes an _ONLY.txt marker (and --partial
    # forces the same), where ~100 bogus MISSING_DUMP entries would
    # otherwise fail every dev loop.
    partial = ("--partial" in sys.argv or only is not None
               or os.path.exists(f"{out_dir}/_ONLY.txt"))
    if not partial:
        for qname in oracle:
            if qname not in results:
                results[qname] = "MISSING_DUMP (query wrote no output dir)"
    bad = 0
    for k in sorted(results):
        status = results[k]
        ok = (status.startswith("OK") or status.startswith("ROWS_ONLY("))
        flag = "PASS" if (ok and "EMPTY" not in status) else "FAIL"
        if flag == "FAIL":
            bad += 1
        print(f"{flag:4} {k:24} {status}")
    print(f"\n{len(results) - bad}/{len(results)} pass")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
