#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/local_verify.py <sf_dir> <verify_out_dir> [prefixes]

For each query dir under <verify_out_dir>: load the Spark parquet
result; if oracle_sql.json has SQL for it, run that SQL in DuckDB over
the <sf_dir> tables and compare (columns sorted by name, rows sorted,
values compared exactly; floats compared bitwise via repr).

Optional 3rd arg (local iteration, mirrors Verify's): comma-separated
query-name PREFIXES to compare — sweep-scale partial compares where a
single oracle's DuckDB footprint needs its own run.
"""
import hashlib
import json
import math
import struct
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Verify's hash-dump mode (SPARK_GRAFT_HASHDUMP=1) ships a 1-row digest
# instead of the full result; detected by exactly this column set.
DIGEST_COLS = ["graft_digest_a", "graft_digest_b",
               "graft_digest_cols", "graft_digest_rows"]

NAN_BITS = 0x7FF8000000000000  # Double.doubleToLongBits canonical NaN


def digest_cell(v):
    """Mirror graft.HashDump's per-cell canonical rendering exactly:
    NULL = the bare \x02 sentinel; every non-null cell is a one-char
    type tag + value, string cells with the three digest
    metacharacters escaped (ADVICE r12: boundary-safe + type-tagged)."""
    if v is None:
        return "\x02"
    if isinstance(v, bool):  # before int: bool is an int subtype
        return "B" + ("true" if v else "false")
    if isinstance(v, float):
        if math.isnan(v):
            return "D" + str(NAN_BITS)
        bits = struct.unpack(">q", struct.pack(">d", v))[0]
        return "D" + str(bits)
    if isinstance(v, str):  # escape char first — no double-escaping
        return "S" + (v.replace("\x03", "\x03\x03")
                       .replace("\x01", "\x031").replace("\x02", "\x032"))
    return "L" + str(v)  # ints decimal


def duck_digest(cur, cols):
    """(a, b, cols_csv, n): order-independent md5-sum digest over the
    oracle cursor's rows, columns sorted by name — HashDump's formula.
    Streams in chunks so sweep-scale results (60 M rows at sf10) never
    materialize in Python memory."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    a = b = n = 0
    while True:
        chunk = cur.fetchmany(100_000)
        if not chunk:
            break
        n += len(chunk)
        for r in chunk:
            s = "\x01".join(digest_cell(r[i]) for i in order)
            h = hashlib.md5(s.encode("utf-8")).hexdigest()
            a += int(h[0:16], 16)
            b += int(h[16:32], 16)
    return (str(a % (1 << 64)), str(b % (1 << 64)),
            ",".join(cols[i] for i in order), n)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return v


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    import os
    # sweep-scale escape hatch: DuckDB's default memory budget spills
    # the quadratic-baseline oracles (q174/q185-truth at sf10: 800 M
    # intermediate pairs) to disk past the sandbox's headroom — on a
    # RAM-rich box, GRAFT_DUCKDB_MEM=96GB holds them in memory instead
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    # the quadratic-baseline oracles spill ~80 GB at sf10 — past the
    # sandbox disk but comfortably inside RAM: GRAFT_DUCKDB_TEMP can
    # point the spill at a tmpfs (/dev/shm), paired with a LOWER
    # memory_limit so working set + spill stay under physical RAM
    tmp = os.environ.get("GRAFT_DUCKDB_TEMP")
    if tmp:
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # driver testdata = single parquet files; sweep-scale scratch
        # data (ScaleUp output) = Spark-written directories of parts
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob
    import os
    ok = fail = rowsonly = 0
    result_dirs = sorted(d for d in glob.glob(f"{out_dir}/q*") if os.path.isdir(d))
    # prefix filter, mirroring Verify's 3rd arg: plain entries include,
    # "-"-prefixed entries exclude (with only exclusions present,
    # everything else is compared) — the sf10 sweep runs "-q177"
    if only:
        prefixes = only.split(",")
        incl = [p for p in prefixes if not p.startswith("-")]
        excl = [p[1:] for p in prefixes if p.startswith("-")]

        def selected(name):
            return ((not incl or any(name.startswith(p) for p in incl))
                    and not any(name.startswith(p) for p in excl))
        result_dirs = [d for d in result_dirs
                       if selected(os.path.basename(d))]
    else:
        def selected(name):
            return True
    # reconcile against the declared query list: a query whose Verify
    # run threw writes no dir and must FAIL here, not vanish. The same
    # filter applies to the declared side so partial compares still
    # reconcile their own slice.
    qlist_path = f"{out_dir}/queries.json"
    if os.path.exists(qlist_path):
        declared = {q for q in json.load(open(qlist_path)) if selected(q)}
        present = {os.path.basename(d) for d in result_dirs}
        for missing in sorted(declared - present):
            print(f"{'FAIL-MISSING':18} {missing:28} no result written")
            fail += 1
    for qdir in result_dirs:
        name = os.path.basename(qdir)
        got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        is_digest = sorted(gcols) == DIGEST_COLS and len(grows) == 1
        if is_digest:
            d = dict(zip(gcols, grows[0]))
        if name not in oracle:
            nrows = d["graft_digest_rows"] if is_digest else len(grows)
            status = "ROWS-ONLY" if nrows > 0 else "ROWS-ONLY-EMPTY!"
            if nrows == 0:
                fail += 1
            else:
                rowsonly += 1
            print(f"{status:18} {name:28} rows={nrows}")
            continue
        exp = con.execute(oracle[name])
        ecols = [d[0] for d in exp.description]
        if is_digest:
            ea, eb, ecsv, en = duck_digest(exp, ecols)
            if d["graft_digest_cols"] != ecsv:
                print(f"FAIL-SCHEMA        {name:28} "
                      f"spark={d['graft_digest_cols']} duck={ecsv}")
                fail += 1
            elif (str(d["graft_digest_a"]), str(d["graft_digest_b"]),
                  int(d["graft_digest_rows"])) != (ea, eb, en):
                print(f"FAIL-DIGEST        {name:28} rows "
                      f"spark={d['graft_digest_rows']} duck={en} "
                      f"a={d['graft_digest_a']}/{ea} b={d['graft_digest_b']}/{eb}")
                fail += 1
            else:
                print(f"OK-DIGEST          {name:28} rows={en}")
                ok += 1
            continue
        erows = exp.fetchall()
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            print(f"FAIL-SCHEMA        {name:28} spark={gc} duck={ec}")
            fail += 1
        elif gr != er:
            ndiff = sum(1 for a, b in zip(gr, er) if a != b) + abs(len(gr) - len(er))
            print(f"FAIL-VALUES        {name:28} rows spark={len(gr)} duck={len(er)} diff~{ndiff}")
            for a, b in list(zip(gr, er))[:200]:
                if a != b:
                    print(f"   spark: {a}\n   duck : {b}")
                    break
            fail += 1
        else:
            print(f"OK                 {name:28} rows={len(gr)}")
            ok += 1
    print(f"\n{ok} ok, {rowsonly} rows-only, {fail} fail")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
