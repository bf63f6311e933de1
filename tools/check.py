#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output vs
DuckDB oracle on the same parquet tables. Usage: check.py <sfDir> <outDir>"""
import sys, json, glob, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Output column types an oracle query may emit. The driver's hasher is
# TYPE-AWARE: repr()-level value equality is NOT enough (r11 lesson: an
# uncast DuckDB sum(BIGINT) yields HUGEINT, value-equal to Spark's BIGINT
# but hash-distinct). Any oracle emitting a type outside this set is a
# latent driver hash-FAIL even when values match.
PORTABLE_TYPES = {
    "BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "FLOAT", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE", "BLOB",
}

def type_audit(con, oracle):
    """Fail any oracle whose DuckDB result schema leaves the portable set."""
    bad = []
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
            for c, t in zip(rel.columns, rel.types):
                ts = str(t)
                base = ts.split("(")[0].strip()
                if ts not in PORTABLE_TYPES and base not in PORTABLE_TYPES:
                    bad.append((name, c, ts))
        except Exception as e:
            bad.append((name, "<query>", f"error: {e}"))
    for name, c, ts in bad:
        print(f"TYPE-FAIL {name}.{c}: {ts} not portable")
    return len(bad)

def canon(rows, cols):
    # driver sorts columns by name before hashing values; emulate + row sort.
    # floats compare EXACTLY (repr) — every oracle gate is engineered for
    # bit-parity (identical IEEE op shapes or exact decimal aggregation).
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    out.sort()
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    fail += type_audit(con, oracle)
    names = sorted(d.split('/')[-1] for d in glob.glob(f"{out_dir}/*") if not d.endswith('.json'))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fail += 1; continue
        r = con.sql(f"SELECT * FROM '{files[0]}'")
        scols, srows = [c.lower() for c in r.columns], r.fetchall()
        if name not in oracle:
            print(f"rows-only {name}: {len(srows)} rows"); ok += 1; continue
        try:
            o = con.sql(oracle[name])
            ocols, orows = [c.lower() for c in o.columns], o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); fail += 1; continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}"); fail += 1; continue
        a, b = canon(srows, scols), canon(orows, ocols)
        if a == b:
            print(f"OK   {name}: {len(a)} rows"); ok += 1
        else:
            diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
            print(f"FAIL {name}: spark {len(a)} rows vs oracle {len(b)} rows; first diffs:")
            for i in diff:
                print(f"   spark  {a[i]}\n   oracle {b[i]}")
            if len(a) != len(b):
                sa, sb = set(a), set(b)
                for x in list(sa - sb)[:2]: print(f"   only-spark  {x}")
                for x in list(sb - sa)[:2]: print(f"   only-oracle {x}")
            fail += 1
    print(f"== {ok} ok, {fail} fail")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
