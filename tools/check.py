#!/usr/bin/env python3
"""Local dev-loop mirror of the driver's correctness gate: read each
query's parquet dump from Verify, run its oracle SQL in DuckDB over the
same SF dir, sort columns by name, compare row-by-row.  Usage:
    python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import glob, json, math, sys
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def type_sig(t):
    """Normalized arrow type signature. Deliberately keeps integer width /
    decimal-vs-int distinctions (DuckDB HUGEINT = decimal128(38,0) vs Spark
    BIGINT = int64 — the exact class of bug the driver's hash catches and a
    value-only compare misses). Only cosmetic encodings are unified."""
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_sig(t.value_type)}>"
    return str(t)

def physical_lint(out_dir, name):
    """r7: the driver's hash is PHYSICAL-byte sensitive — equal logical
    values stored as INT32-backed parquet decimal (Spark) vs decimal128
    (DuckDB) hash differently (the r6 f_try_arith failure; r5's HUGEINT
    was the same class one level up). Read the Spark parquet FOOTER and
    flag any physical/logical type outside the boring whitelist
    (int32/int64/double/boolean/string/binary/date/timestamp + lists):
    any DECIMAL annotation or INT96 fails here even when the arrow
    logical compare would pass."""
    bad = []
    for f in glob.glob(f"{out_dir}/{name}/*.parquet"):
        sch = pq.ParquetFile(f).schema
        for i in range(len(sch)):
            col = sch.column(i)
            lt = str(col.logical_type)
            if col.physical_type == "INT96" or lt.startswith("Decimal"):
                bad.append((col.path, col.physical_type, lt))
    return bad

def oracle_type_lint(schema):
    """Flag oracle outputs whose arrow type is outside the boring-type
    whitelist (SURVEY determinism rule): decimals (incl. DuckDB HUGEINT
    = decimal128(38,0)) will never byte-match Spark's encoding."""
    return [(f.name, str(f.type)) for f in schema
            if pa.types.is_decimal(f.type)]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v

def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp_arrow = con.sql(sql).arrow()
            exp = exp_arrow.to_pandas()
        except Exception as e:
            fails.append(name); print(f"FAIL {name}: oracle error: {e}"); continue
        try:
            got_arrow = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").arrow()
            got = got_arrow.to_pandas()
        except Exception as e:
            fails.append(name); print(f"FAIL {name}: spark output missing: {e}"); continue
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            fails.append(name)
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            continue
        type_bad = []
        for c in exp.columns:
            ts_e = type_sig(exp_arrow.schema.field(c).type)
            ts_g = type_sig(got_arrow.schema.field(c).type)
            if ts_e != ts_g:
                type_bad.append((c, ts_e, ts_g))
        if type_bad:
            fails.append(name)
            for c, te, tg in type_bad:
                print(f"FAIL {name}: col {c} type: oracle={te} spark={tg}")
            continue
        phys_bad = physical_lint(out_dir, name)
        orc_bad = oracle_type_lint(exp_arrow.schema)
        if phys_bad or orc_bad:
            fails.append(name)
            for p, pt, lt in phys_bad:
                print(f"FAIL {name}: exotic PHYSICAL type in spark parquet: {p} {pt} {lt}")
            for c, t in orc_bad:
                print(f"FAIL {name}: oracle col {c} is {t} — cast to BIGINT/DOUBLE (boring-type rule)")
            continue
        if len(exp) != len(got):
            fails.append(name)
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            continue
        mismatch = None
        for i in range(len(exp)):
            re_, rg = exp.iloc[i], got.iloc[i]
            for c in exp.columns:
                a, b = norm(re_[c]), norm(rg[c])
                if isinstance(a, float) or isinstance(b, float):
                    an, bn = (a is None or (isinstance(a, float) and math.isnan(a))), (b is None or (isinstance(b, float) and math.isnan(b)))
                    if an and bn:
                        continue
                    if an != bn or abs(a - b) > 1e-9:
                        mismatch = (i, c, a, b); break
                elif str(a) != str(b):
                    mismatch = (i, c, a, b); break
            if mismatch:
                break
        if mismatch:
            fails.append(name)
            print(f"FAIL {name}: row {mismatch[0]} col {mismatch[1]}: oracle={mismatch[2]!r} spark={mismatch[3]!r}")
        else:
            print(f"ok   {name} ({len(exp)} rows)")
    # queries without oracle: rows>0 smoke
    import glob, os
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle or (only and name not in only):
            continue
        try:
            n = duckdb.sql(f"SELECT count(*) FROM '{d}*.parquet'").fetchone()[0]
            print(f"ok   {name} (no oracle, {n} rows)" if n > 0 else f"WARN {name}: 0 rows")
            if n == 0:
                fails.append(name)
        except Exception as e:
            fails.append(name); print(f"FAIL {name}: unreadable: {e}")
    print(f"\n{len(fails)} failures" + (f": {fails}" if fails else ""))
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
