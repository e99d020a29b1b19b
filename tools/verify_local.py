#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs DuckDB on oracle_sql.json over the same parquet tables, loads each
query's Spark parquet output, sorts columns by name and rows by value,
and hash-compares. Usage:

    python3 tools/verify_local.py <sfDir> <verifyOutDir>
"""
import hashlib
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style: repr of float is stable; round-trip via repr
        return repr(v)
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        tab = pq.read_table(d)
        scols = tab.column_names
        srows = [tuple(r[c] for c in scols) for r in tab.to_pylist()]
        if name not in oracle:
            results[name] = {"check": "rows_only", "rows": len(srows),
                             "ok": len(srows) > 0}
            continue
        try:
            cur = con.execute(oracle[name])
            ocols = [c[0] for c in cur.description]
            orows = cur.fetchall()
            # The DRIVER reads the oracle via Arrow, where e.g. DuckDB
            # SUM(BIGINT) surfaces as decimal128(38,0) and hash-mismatches
            # Spark's int64 even when every value is equal (round-1
            # q_window_running/events_sessions failure). fetchall() masks
            # that, so ALSO compare Arrow type classes.
            otab = con.execute(oracle[name]).arrow()
        except Exception as e:
            results[name] = {"check": "oracle_error", "ok": False,
                             "error": str(e)[:300]}
            continue
        schema_ok = sorted(scols) == sorted(ocols)
        rows_ok = len(srows) == len(orows)
        hash_ok = schema_ok and table_hash(scols, srows) == table_hash(ocols, orows)

        def tclass(t):
            import pyarrow.types as pt
            if pt.is_integer(t):
                return "int"
            if pt.is_floating(t):
                return "float"
            if pt.is_decimal(t):
                return "decimal"
            if pt.is_string(t) or pt.is_large_string(t):
                return "str"
            if pt.is_timestamp(t):
                return "ts"
            return str(t)

        type_mismatch = []
        if schema_ok:
            stypes = {c: tclass(tab.schema.field(c).type) for c in scols}
            otypes = {c: tclass(otab.schema.field(c).type) for c in ocols}
            type_mismatch = [
                {"col": c, "spark": stypes[c], "oracle": otypes[c]}
                for c in scols if stypes[c] != otypes[c]
            ]
        # A final DECIMAL column is a driver-red trap even when both
        # sides agree bit-for-bit here: the driver's compare reads the
        # oracle via pandas, where DuckDB DECIMAL surfaces as float64
        # ("123.0", lossy past 2^53) while Spark's parquet decimal
        # reads back exact — the r12-r14 q_emb_norm_stats /
        # q_eigencentrality divergence. Flag it locally so it can
        # never ship again; readouts must be BIGINT/DOUBLE.
        decimal_cols = [c for c in scols
                        if tclass(tab.schema.field(c).type) == "decimal"]
        decimal_cols += [c for c in ocols
                         if tclass(otab.schema.field(c).type) == "decimal"
                         and c not in decimal_cols]
        results[name] = {"check": "oracle", "rows": len(srows),
                         "oracle_rows": len(orows), "schema_ok": schema_ok,
                         "rows_ok": rows_ok, "hash_ok": hash_ok,
                         "ok": (schema_ok and rows_ok and hash_ok
                                and not type_mismatch
                                and not decimal_cols)}
        if type_mismatch:
            results[name]["arrow_type_mismatch"] = type_mismatch
        if decimal_cols:
            results[name]["decimal_output_cols"] = decimal_cols
        if not results[name]["ok"]:
            # dump first differing line for debugging
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_o = sorted(range(len(ocols)), key=lambda i: ocols[i]) if schema_ok else []
            ls = sorted("\x01".join(norm_cell(r[i]) for i in order_s) for r in srows)
            lo = sorted("\x01".join(norm_cell(r[i]) for i in order_o) for r in orows) if schema_ok else []
            for a, b in zip(ls, lo):
                if a != b:
                    results[name]["first_diff"] = {"spark": a[:200], "oracle": b[:200]}
                    break
    n_ok = sum(1 for r in results.values() if r["ok"])
    print(json.dumps(results, indent=1))
    print(f"== {n_ok}/{len(results)} ok")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
