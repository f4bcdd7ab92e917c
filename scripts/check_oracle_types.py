#!/usr/bin/env python3
"""Oracle result-type portability guard.

DESCRIBEs every oracle SQL statement against the parquet tables and fails
if any result column's DuckDB type falls outside the portable whitelist.

Why: the driver's hasher and this repo's replica (check_oracle.py) may
fetch DuckDB results through different client paths (str() vs arrow vs
pandas), and only a small set of types render identically across all of
them. Engine-widened types — HUGEINT from sum(BIGINT), windowed-sum
int128, TIMESTAMP_NS — render as 9 vs 9.0 vs Decimal('9') depending on
the fetch path, so a value-identical result can still hash-mismatch
(this killed q89/q90 in round 9). Every oracle must produce only
portable types; widen-prone aggregates get an explicit outer CAST.

Usage: python3 scripts/check_oracle_types.py <sfDir> <oracle_sql.json>
Exit 0 = all portable; 1 = violations (listed).
"""
import json, os, re, sys
import duckdb

# Types whose textual/arrow/pandas renderings agree across fetch paths.
PORTABLE = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT",
    "VARCHAR", "BOOLEAN", "DATE", "BLOB",
    "TIMESTAMP",  # micros; TIMESTAMP_NS is NOT portable
}
# Parameterized / nested types: element types must themselves be portable.
NESTED_RE = re.compile(r"^(?:(\w+)\[\]|LIST\((.+)\)|STRUCT\((.+)\))$")


def type_ok(t: str) -> bool:
    t = t.strip()
    if t in PORTABLE:
        return True
    m = NESTED_RE.match(t)
    if m:
        if m.group(1):  # e.g. BIGINT[]
            return type_ok(m.group(1))
        inner = m.group(2) or m.group(3)
        # STRUCT(a T1, b T2) / LIST(T): check each field type token.
        # Split on top-level commas only.
        depth, parts, cur = 0, [], ""
        for ch in inner:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append(cur)
                cur = ""
            else:
                cur += ch
        parts.append(cur)
        for p in parts:
            ft = p.strip().split(" ")[-1] if m.group(3) else p.strip()
            if not type_ok(ft):
                return False
        return True
    return False


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    with open(oracle_path) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    bad = []
    for name in sorted(oracle):
        try:
            desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            bad.append((name, "<describe failed>", str(e)[:200]))
            continue
        for col, typ, *_ in desc:
            if not type_ok(typ):
                bad.append((name, col, typ))
    print(f"oracles={len(oracle)} violations={len(bad)}")
    for name, col, typ in bad:
        print(f"  NONPORTABLE {name}.{col}: {typ}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
