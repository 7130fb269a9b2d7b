#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness check.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query dir in <outDir>, reads the Spark parquet result and the
oracle SQL from oracle_sql.json, executes the SQL in DuckDB with the
testdata parquet registered as views, and compares: schema (column name
sets), row count, and values (columns sorted by name, rows sorted, floats
with tolerance AND exact-hash both reported so we can see how fragile an
exact-hash driver compare would be).
"""
import json, math, sys, glob, os
import duckdb
import pyarrow.parquet as pq

def _sortkey(x):
    # Round floats before stringifying so FP noise cannot reorder
    # nearly-equal rows differently on the Spark vs oracle side. The key is
    # quantized COARSER (8 significant digits) than val_eq's 1e-9 relative
    # tolerance: a key at exactly tolerance granularity can split two values
    # the comparator deems equal onto different sides of a sort boundary.
    if x is None:
        return (True, "")
    if isinstance(x, float):
        return (False, f"{x:.8g}")
    return (False, str(x))

def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(_sortkey(x) for x in t))

def _canon_type(t):
    # Normalize representational variants the DRIVER's hash also treats as
    # equal (calibrated against CORRECTNESS_r08: queries green there must
    # stay green here): integer widths (Spark int32 vs DuckDB int64),
    # timestamp unit/tz (Spark INT96 reads as ns, DuckDB as us), and
    # large_string/large_binary. decimal128 stays DISTINCT from int64 —
    # that split is exactly the class the driver hash rejects (the r8
    # un-cast HUGEINT sum() failures).
    import pyarrow as pa
    if pa.types.is_integer(t): return pa.int64()
    # Fractional decimals hashed green against double in r8 (f_grid_expand:
    # decimal128(22,2) vs float64); only scale-0 decimals (HUGEINT sums)
    # split from integer columns.
    if pa.types.is_decimal(t) and t.scale > 0: return pa.float64()
    if pa.types.is_floating(t): return pa.float64()
    if pa.types.is_large_string(t): return pa.string()
    if pa.types.is_large_binary(t): return pa.binary()
    if pa.types.is_timestamp(t): return pa.timestamp('us')
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return pa.list_(_canon_type(t.value_type))
    return t

def dtype_diffs(spark_schema, oracle_schema):
    # The driver's exact hash is TYPE-sensitive: an un-cast DuckDB sum()
    # returns HUGEINT -> decimal128(38,0) and hash-fails against Spark's
    # int64 even when every value matches. Catch that class locally.
    sd = {f.name: _canon_type(f.type) for f in spark_schema}
    od = {f.name: _canon_type(f.type) for f in oracle_schema}
    return [(n, str(sd[n]), str(od[n]))
            for n in sorted(set(sd) & set(od)) if sd[n] != od[n]]

def val_eq(a, b):
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

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output"); n_fail += 1; continue
        import pyarrow as pa
        tbl = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
        scols = tbl.column_names
        srows = [tuple(r[c] for c in scols) for r in tbl.to_pylist()]
        if name not in oracle:
            print(f"rows  {name}: {len(srows)} rows (rows-only check)")
            n_rowsonly += 1
            if len(srows) == 0:
                print(f"      WARN: empty result")
            continue
        try:
            otbl = con.execute(oracle[name]).arrow()
            ocols = otbl.column_names
            orows = [tuple(r[c] for c in ocols) for r in otbl.to_pylist()]
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1; continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: schema mismatch spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1; continue
        tdiffs = dtype_diffs(tbl.schema, otbl.schema)
        if tdiffs:
            print(f"FAIL  {name}: dtype mismatch (driver hash is type-sensitive): "
                  + ", ".join(f"{n} spark={s} oracle={o}" for n, s, o in tdiffs))
            n_fail += 1; continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_fail += 1; continue
        cs, co = canon(srows, scols), canon(orows, ocols)
        bad = exact = 0
        first_bad = None
        for rs, ro in zip(cs, co):
            for a, b in zip(rs, ro):
                if not val_eq(a, b):
                    bad += 1
                    if first_bad is None:
                        first_bad = (a, b)
                elif str(a) == str(b):
                    exact += 1
        total = len(cs) * max(1, len(scols))
        if bad:
            print(f"FAIL  {name}: {bad}/{total} values differ, e.g. {first_bad}")
            n_fail += 1
        else:
            inexact = total - exact
            note = f" ({inexact} tolerance-only matches)" if inexact else ""
            print(f"pass  {name}: {len(srows)} rows{note}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    sys.exit(main(sf, out))
