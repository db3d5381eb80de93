#!/usr/bin/env python3
"""Dev-only local oracle harness (mirrors the driver's DuckDB compare).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Reads each <outDir>/<name> parquet (Spark output) and runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir tables,
then compares schema + values with columns sorted by name.
"""
import sys, json, math, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # array columns come back as numpy arrays (Spark) / lists (DuckDB):
    # normalize both to tuples so == compares element-wise values
    if hasattr(v, "tolist"):
        return tuple(norm(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_df()
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(sdf)} rows)")
            n_noracle += 1
            continue
        try:
            odf = con.execute(oracle[name]).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1
            continue
        # Driver-faithful: the driver sorts result rows by ALL columns before
        # hashing. A cell the sort cannot handle (numpy arrays are unhashable/
        # uncomparable) crashes the driver harness — so it must FAIL here too,
        # not be normalized away (the r5 q_embed_quantize/whiten blind spot).
        try:
            sdf = sdf[scols].sort_values(by=scols, ignore_index=True)
            odf = odf[scols].sort_values(by=scols, ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: row-sort crash (driver-fatal): {type(e).__name__}: {e}")
            n_fail += 1
            continue
        # Representation check: the driver hashes serialized values, so a
        # dtype that renders differently (Decimal vs float/hugeint) is a
        # hash mismatch even when values are numerically equal.
        repbad = None
        for c in scols:
            st = next((type(v).__name__ for v in sdf[c].tolist() if v is not None), None)
            ot = next((type(v).__name__ for v in odf[c].tolist() if v is not None), None)
            if st is not None and ot is not None and st != ot:
                repbad = (c, st, ot)
                break
        if repbad:
            c, st, ot = repbad
            print(f"FAIL {name}: col={c} representation spark={st} oracle={ot}")
            n_fail += 1
            continue
        bad = None
        for c in scols:
            sv = [norm(v) for v in sdf[c].tolist()]
            ov = [norm(v) for v in odf[c].tolist()]
            if sv != ov:
                for i, (a, b) in enumerate(zip(sv, ov)):
                    if a != b and not (a is None and b is None):
                        bad = (c, i, a, b)
                        break
                if bad:
                    break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col={c} row={i} spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
