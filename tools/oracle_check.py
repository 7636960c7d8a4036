#!/usr/bin/env python3
"""Self-check: replicate the driver's DuckDB oracle compare locally.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [--normalization-matrix]
Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
SQL against DuckDB over the parquet tables in <sfDir>, and compares
row count / column names / a column-name-sorted value hash against the
Spark result parquet in <verifyOutDir>/<name>/.

--normalization-matrix: instead of the single compare, render every
output column of every oracle-checked query under each plausible checker
normalization (str/str(Decimal), float %.9g coercion, repr-precision
%.17g floats, plain str-of-everything) and flag any query whose MATCH
OUTCOME depends on which normalization the checker uses — plus any query
whose compared surface carries a DECIMAL-typed column on either engine
(precision-tagged rendering differs across checkers even when values are
equal: Spark decimal(28,2) vs DuckDB decimal(38,2) was the r11 red).
The driver's checker is a black box; a query that hashes identically
under EVERY normalization cannot be split by it. Exit 0 iff zero
sensitive queries.
"""
import sys, os, json, glob, hashlib
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm(v[k])}" for k in sorted(v)) + "}"
    return str(v)

def norm_lines(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm(r[i]) for i in order) for r in rows)

def table_hash(lines):
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def first_diffs(s_lines, o_lines, k=5):
    """First k (spark, oracle) normalized-line pairs that differ.

    Both lists are sorted, so walk them in lockstep: equal lines are
    consumed together; at a mismatch, emit the pair and advance the
    lexicographically-smaller side (its line has no partner)."""
    out, i, j = [], 0, 0
    while (i < len(s_lines) or j < len(o_lines)) and len(out) < k:
        s = s_lines[i] if i < len(s_lines) else None
        o = o_lines[j] if j < len(o_lines) else None
        if s == o:
            i += 1; j += 1
            continue
        out.append((s, o))
        if o is None or (s is not None and s < o):
            i += 1
        elif s is None or o < s:
            j += 1
        else:
            i += 1; j += 1
    return out

import decimal, datetime

def norm_floatcoerce(v):
    """Checker variant: DECIMAL coerced through binary double, %.9g."""
    if isinstance(v, decimal.Decimal):
        return norm(float(v))
    if isinstance(v, list):
        return "[" + ",".join(norm_floatcoerce(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_floatcoerce(v[k])}" for k in sorted(v)) + "}"
    return norm(v)

def norm_r17(v):
    """Checker variant: floats at repr precision (%.17g)."""
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.17g}"
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.17g}"
    if isinstance(v, list):
        return "[" + ",".join(norm_r17(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_r17(v[k])}" for k in sorted(v)) + "}"
    return norm(v)

def norm_str(v):
    """Checker variant: plain str() of everything (floats via repr)."""
    if v is None:
        return "NULL"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_str(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_str(v[k])}" for k in sorted(v)) + "}"
    return str(v)

SCHEMES = [("base", norm), ("floatcoerce", norm_floatcoerce),
           ("r17", norm_r17), ("strall", norm_str)]

def norm_lines_with(fn, cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(fn(r[i]) for i in order) for r in rows)

def risky_types(vals_by_col):
    """Columns whose VALUES are normalization-risky: any Decimal (render
    depends on precision tagging / str-vs-float path) anywhere in the
    compared surface, including nested in lists/structs."""
    def has_decimal(v):
        if isinstance(v, decimal.Decimal):
            return True
        if isinstance(v, list):
            return any(has_decimal(x) for x in v)
        if isinstance(v, dict):
            return any(has_decimal(x) for x in v.values())
        return False
    return sorted(c for c, vs in vals_by_col.items()
                  if any(has_decimal(v) for v in vs))

def normalization_matrix(con, oracle, out_dir):
    n_sensitive = 0
    n_checked = 0
    for name in sorted(oracle):
        d = os.path.join(out_dir, name)
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        if not files:
            print(f"  {name}: no spark output, skipped")
            continue
        tbl = pa.concat_tables([pq.read_table(f) for f in files])
        s_rows = [[r[c] for c in tbl.column_names] for r in tbl.to_pylist()]
        try:
            res = con.execute(oracle[name])
            o_cols = [d0[0] for d0 in res.description]
            o_rows = res.fetchall()
        except Exception as e:
            print(f"  {name}: oracle err: {e}")
            n_sensitive += 1
            continue
        n_checked += 1
        reasons = []
        s_vals = {c: [r[i] for r in s_rows]
                  for i, c in enumerate(tbl.column_names)}
        o_vals = {c: [r[i] for r in o_rows] for i, c in enumerate(o_cols)}
        for side, vals in (("spark", s_vals), ("oracle", o_vals)):
            rk = risky_types(vals)
            if rk:
                reasons.append(f"{side} DECIMAL-valued column(s) {rk}")
        outcomes = {}
        for scheme, fn in SCHEMES:
            sl = norm_lines_with(fn, tbl.column_names, s_rows)
            ol = norm_lines_with(fn, o_cols, o_rows)
            outcomes[scheme] = table_hash(sl) == table_hash(ol)
        if len(set(outcomes.values())) > 1:
            reasons.append(f"match outcome depends on normalization: {outcomes}")
        elif not all(outcomes.values()):
            reasons.append(f"mismatch under every normalization: {outcomes}")
        if reasons:
            n_sensitive += 1
            print(f"  SENSITIVE {name}: " + "; ".join(reasons))
    print(f"NORMALIZATION_MATRIX checked={n_checked} sensitive={n_sensitive}")
    sys.exit(1 if n_sensitive else 0)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
                        if os.path.isdir(p) else
                        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    if "--normalization-matrix" in sys.argv[3:]:
        normalization_matrix(con, oracle, out_dir)
    n_pass = n_fail = n_noorc = 0
    fails = []
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        tbl = pa.concat_tables([pq.read_table(f) for f in files]) if files else None
        if tbl is None:
            if name in oracle:
                n_fail += 1
                fails.append((name, "no parquet output for oracle-listed query"))
            else:
                print(f"  {name}: no parquet output (skipped)")
            continue
        s_cols = sorted(tbl.column_names)
        s_rows = [[r[c] for c in tbl.column_names] for r in tbl.to_pylist()]
        if name not in oracle:
            n_noorc += 1
            print(f"  {name}: rows-only ({len(s_rows)} rows)")
            continue
        try:
            res = con.execute(oracle[name])
            o_cols = [d0[0] for d0 in res.description]
            o_rows = res.fetchall()
        except Exception as e:
            n_fail += 1
            fails.append((name, f"oracle err: {e}"))
            continue
        ok_rows = len(s_rows) == len(o_rows)
        ok_cols = s_cols == sorted(o_cols)
        ok_hash = False
        if ok_rows and ok_cols:
            sl = norm_lines(tbl.column_names, s_rows)
            ol = norm_lines(o_cols, o_rows)
            ok_hash = table_hash(sl) == table_hash(ol)
            if not ok_hash:
                # Divergence diagnostic: show the first differing
                # normalized lines so a hash-red row is a 5-minute
                # diagnosis, not a round-long mystery (VERDICT r10 #5).
                print(f"  {name}: HASH DIVERGENCE (cols sorted: {s_cols})")
                for s, o in first_diffs(sl, ol):
                    print(f"    spark : {s}")
                    print(f"    oracle: {o}")
        if ok_rows and ok_cols and ok_hash:
            n_pass += 1
        else:
            n_fail += 1
            fails.append((name, f"rows {len(s_rows)}/{len(o_rows)} cols_ok={ok_cols} hash_ok={ok_hash} spark_cols={s_cols} oracle_cols={sorted(o_cols)}"))
    print(f"PASS={n_pass} FAIL={n_fail} ROWS_ONLY={n_noorc}")
    for name, msg in fails:
        print(f"FAIL {name}: {msg}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
