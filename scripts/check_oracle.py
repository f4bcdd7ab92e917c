#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the parquet
tables in <sfDir>, and compares rows / schema / value-hash the way the
driver does (columns sorted by name, rows sorted, values hashed).
"""
import json, os, sys, hashlib
import duckdb

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # driver-style: canonical repr at 12 significant digits
        if v != v:
            return "NaN"
        return f"{v:.12g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results = {}
    names = sorted(n for n in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, n)))
    for name in names:
        if only and name not in only:
            continue
        entry = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "err": None}
        try:
            sp = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            sp_cols = [d[0] for d in sp.description]
            sp_rows = sp.fetchall()
            if name not in oracle:
                entry["err"] = "no_oracle"
                entry["spark_rows"] = len(sp_rows)
                results[name] = entry
                continue
            orc = con.execute(oracle[name])
            orc_cols = [d[0] for d in orc.description]
            orc_rows = orc.fetchall()
            entry["spark_rows"] = len(sp_rows)
            entry["oracle_rows"] = len(orc_rows)
            entry["rows_match"] = len(sp_rows) == len(orc_rows)
            entry["schema_match"] = sorted(sp_cols) == sorted(orc_cols)
            if entry["rows_match"] and entry["schema_match"]:
                entry["hash_match"] = (table_hash(sp_cols, sp_rows)
                                       == table_hash(orc_cols, orc_rows))
            else:
                entry["hash_match"] = False
        except Exception as e:
            entry["err"] = str(e)[:300]
        results[name] = entry
    bad = {k: v for k, v in results.items()
           if v["err"] not in (None, "no_oracle") or v["hash_match"] is False}
    ok = sum(1 for v in results.values() if v.get("hash_match"))
    no_orc = sum(1 for v in results.values() if v["err"] == "no_oracle")
    print(f"checked={len(results)} hash_ok={ok} no_oracle={no_orc} bad={len(bad)}")
    for k, v in sorted(bad.items()):
        print(f"  BAD {k}: {v}")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
