#!/usr/bin/env python3
"""Half-way (rounding-tie) audit for the oracle SQL suite.

Context: the only correctness failures the driver gate has EVER
produced after round 6 were `round(double, k)` readouts whose input
landed exactly on a representable half-way point — there the result
depends on the engine's tie rule (Spark HALF_UP on the decimal
rendering; DuckDB scaled-multiply whose tie behavior has differed
between DuckDB versions). Such rows are invisible to verify_local.py:
the local DuckDB and Spark can agree while the DRIVER's DuckDB
disagrees. This tool closes that blind spot by construction:

For every oracle SQL containing round(), it rewrites each round call
into three variants — DuckDB-native, half-away-from-zero (__rhu), and
half-toward-zero (__rhd) — and hash-compares the three result sets.
The variants can only differ at exact half-way points, so:

  all three hashes equal  =>  NO value in this query's result, on this
                              data, sits on a rounding tie; every
                              engine/version computes the same output.
  any pair differs        =>  the query emits a tie-sensitive value;
                              convert the readout to truncation /
                              integer arithmetic (BASELINE.md
                              "rounding-determinism contract").

Usage:  python3 tools/round_audit.py <sfDir> <verifyOutDir>
(<verifyOutDir> only needs oracle_sql.json.)
Exit 0 iff no query is tie-sensitive.
"""
import json
import os
import re
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from verify_local import TABLES, table_hash  # noqa: E402

# The trailing `+ 0.0` normalizes IEEE negative zero (ceil(-0.5) is
# -0.0, which the repr-based row hash would read as a difference even
# though no engine's round() ever disagrees about a true zero).
MACROS = """
CREATE MACRO __rhu2(x, k) AS CASE
  WHEN x IS NULL THEN NULL
  WHEN x >= 0 THEN floor(x * power(10, k) + 0.5) / power(10, k) + 0.0
  ELSE -(floor((-x) * power(10, k) + 0.5) / power(10, k)) + 0.0 END;
CREATE MACRO __rhd2(x, k) AS CASE
  WHEN x IS NULL THEN NULL
  WHEN x >= 0 THEN ceil(x * power(10, k) - 0.5) / power(10, k) + 0.0
  ELSE -(ceil((-x) * power(10, k) - 0.5) / power(10, k)) + 0.0 END;
CREATE MACRO __rhu1(x) AS __rhu2(x, 0);
CREATE MACRO __rhd1(x) AS __rhd2(x, 0);
"""

ROUND_RE = re.compile(r"(?<![A-Za-z0-9_])round\s*\(", re.IGNORECASE)


def _call_arity(sql, open_paren_idx):
    """Count top-level commas inside the call starting at '('."""
    depth = 0
    commas = 0
    in_str = False
    i = open_paren_idx
    while i < len(sql):
        c = sql[i]
        if in_str:
            if c == "'":
                in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return commas + 1
        elif c == "," and depth == 1:
            commas += 1
        i += 1
    raise ValueError("unbalanced parens")


def rewrite(sql, prefix):
    """Rename every round(...) call to <prefix>1/<prefix>2 by arity."""
    while True:
        m = ROUND_RE.search(sql)
        if m is None:
            return sql
        arity = _call_arity(sql, m.end() - 1)
        if arity not in (1, 2):
            raise ValueError(f"round with arity {arity}")
        sql = sql[: m.start()] + f"{prefix}{arity}(" + sql[m.end():]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    con.execute(MACROS)
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    flagged, errors, clean = [], [], 0
    audited = 0
    for name in sorted(oracle):
        sql = oracle[name]
        if not ROUND_RE.search(sql):
            continue
        audited += 1
        hashes = {}
        try:
            for variant, vsql in (
                ("native", sql),
                ("half_up", rewrite(sql, "__rhu")),
                ("half_down", rewrite(sql, "__rhd")),
            ):
                cur = con.execute(vsql)
                cols = [c[0] for c in cur.description]
                hashes[variant] = table_hash(cols, cur.fetchall())
        except Exception as e:  # noqa: BLE001
            errors.append({"query": name, "error": str(e)[:200]})
            continue
        if len(set(hashes.values())) == 1:
            clean += 1
        else:
            flagged.append({"query": name, "hashes": hashes})
    print(json.dumps({
        "audited": audited,
        "tie_free": clean,
        "tie_sensitive": flagged,
        "errors": errors,
    }, indent=1))
    return 0 if not flagged and not errors else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
