#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs the
corresponding oracle_sql.json entry in DuckDB with the sfDir tables
registered by name; compares column-name-sorted, row-sorted values.
"""
import json, sys, math, glob, os
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                # Exact — the driver's hash is exact; rounding here (round-2
                # mistake) masked mismatches the driver then caught.
                if math.isnan(v): v = "NaN"
                else: v = repr(v)
            rr.append(str(v))
        out.append(tuple(rr))
    out.sort()
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISSING spark output: {name}"); n_fail += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({spark_files!r})").fetchall()
            gcols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            ecols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: cols {sorted(gcols)} vs {sorted(ecols)}")
            n_fail += 1; continue
        # The driver's hash is type-sensitive (round-1 lesson: DuckDB
        # SUM→HUGEINT/DECIMAL(38,2) vs Spark BIGINT/DECIMAL(28,2) fails
        # the hash even when values match) — so compare declared types too.
        con.execute(f"SELECT * FROM read_parquet({spark_files!r}) LIMIT 0")
        gtypes = sorted((d[0], str(d[1])) for d in con.description)
        # Round-2 lesson: DECIMAL outputs fail the driver hash even at
        # matched declared width/scale — only BIGINT/DOUBLE/etc. are safe.
        decs = [n for n, t in gtypes if "DECIMAL" in t.upper()]
        if decs:
            print(f"FAIL {name}: DECIMAL output columns {decs} "
                  "(driver hash rejects decimals; use BIGINT/DOUBLE)")
            n_fail += 1; continue
        con.execute(f"SELECT * FROM ({sql}) LIMIT 0")
        etypes = sorted((d[0], str(d[1])) for d in con.description)
        if gtypes != etypes:
            print(f"FAIL {name}: dtypes differ")
            for (gn, gt), (en, et) in zip(gtypes, etypes):
                if gt != et:
                    print(f"  {gn}: spark={gt} oracle={et}")
            n_fail += 1; continue
        cg, ce = canon(got, gcols), canon(exp, ecols)
        if cg == ce:
            print(f"PASS {name} ({len(cg)} rows)"); n_pass += 1
        else:
            n_fail += 1
            diff = [i for i, (a, b) in enumerate(zip(cg, ce)) if a != b][:3]
            print(f"FAIL {name}: {len(cg)} vs {len(ce)} rows; "
                  f"first diffs at {diff}")
            for i in diff:
                print(f"  spark : {cg[i]}\n  oracle: {ce[i]}")
    # queries without oracle → rows-only
    for name in glob.glob(f"{out_dir}/*/"):
        qn = os.path.basename(name.rstrip("/"))
        if qn not in oracles:
            files = glob.glob(f"{name}/*.parquet")
            n = con.execute(
                f"SELECT count(*) FROM read_parquet({files!r})"
            ).fetchone()[0] if files else 0
            print(f"ROWS-ONLY {qn}: {n} rows")
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
