# Stress-corpus generator: writes an sf1-equivalent (copies x sf0.1)
# dataset for the headline-slice scaling study (VERDICT r7 ask #7).
#
# Each copy shifts every key column by (max_key + 1) * i so joins stay
# referentially intact and key cardinality scales with volume (a plain
# UNION ALL of identical keys would collapse under groupBy and measure
# nothing). Document text gets a per-copy marker token prepended (copy
# 0 is byte-identical), so cloned docs are NEAR-duplicates rather than
# exact ones -- exercising the minhash/LSH paths the way a real 10x
# corpus would, instead of letting exact dedup trivially fold 10 -> 1.
# n_chars is recomputed where text changes. Dims (region/nation) are
# fixed-size by definition and stay single-copy, as at any real SF.
#
# Usage: python3 tools/make_stress.py SRC_DIR OUT_DIR COPIES
import sys

import duckdb

src, out, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
con = duckdb.connect()

import os

os.makedirs(out, exist_ok=True)


def emit(table, sql):
    con.sql(
        f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(
        f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


def shift(table, keys, text_col=None):
    t = f"'{src}/{table}.parquet'"
    offs = {
        k: con.sql(f"SELECT max({k}) + 1 FROM {t}").fetchone()[0]
        for k in keys
    }
    parts = []
    for i in range(copies):
        cols = []
        for (name,) in [
            (c[0],) for c in con.sql(f"DESCRIBE SELECT * FROM {t}").fetchall()
        ]:
            if name in offs:
                cols.append(f"{name} + {offs[name] * i} AS {name}")
            elif text_col and name == text_col and i > 0:
                cols.append(f"'v{i} ' || {name} AS {name}")
            elif text_col and name == "n_chars" and i > 0:
                cols.append(f"length('v{i} ' || {text_col}) AS n_chars")
            else:
                cols.append(name)
        parts.append(f"SELECT {', '.join(cols)} FROM {t}")
    return " UNION ALL ".join(parts)


emit("region", f"SELECT * FROM '{src}/region.parquet'")
emit("nation", f"SELECT * FROM '{src}/nation.parquet'")
emit("customer", shift("customer", ["c_custkey"]))
emit("supplier", shift("supplier", ["s_suppkey"]))
emit("part", shift("part", ["p_partkey"]))
# orders' o_custkey must shift by the CUSTOMER offset to keep the FK
cust_off = con.sql(
    f"SELECT max(c_custkey) + 1 FROM '{src}/customer.parquet'").fetchone()[0]
ord_off = con.sql(
    f"SELECT max(o_orderkey) + 1 FROM '{src}/orders.parquet'").fetchone()[0]
part_off = con.sql(
    f"SELECT max(p_partkey) + 1 FROM '{src}/part.parquet'").fetchone()[0]
supp_off = con.sql(
    f"SELECT max(s_suppkey) + 1 FROM '{src}/supplier.parquet'").fetchone()[0]
emit("orders", " UNION ALL ".join(
    f"""SELECT o_orderkey + {ord_off * i} AS o_orderkey,
          o_custkey + {cust_off * i} AS o_custkey,
          o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet'""" for i in range(copies)))
emit("lineitem", " UNION ALL ".join(
    f"""SELECT l_orderkey + {ord_off * i} AS l_orderkey,
          l_partkey + {part_off * i} AS l_partkey,
          l_suppkey + {supp_off * i} AS l_suppkey,
          l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
          l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet'""" for i in range(copies)))
emit("events", shift("events", ["event_id", "user_id"]))
emit("documents", shift("documents", ["doc_id"], text_col="text"))
emit("embeddings", shift("embeddings", ["vec_id"]))
print("done")
