#!/usr/bin/env python
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python tools/check_oracle.py <sfDir> <verifyOutDir> [--json SUMMARY.json]

Loads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB against the same
parquet tables, sorts columns by name + rows by value, and compares.
With --json, also writes a machine-readable pass/fail summary (the
committed VERIFY_SELF.json) so an empty driver-side correctness
artifact is provably a harness failure, not an engine one.
NOT part of the Scala library — dev tooling only.
"""
import json, subprocess, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps -> utc-naive usec, floats stay
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.floor("us")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir, out_dir, json_out=None):
    results = {}
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    def fail(name, why):
        results[name] = f"fail: {why}"
        print(f"FAIL {name}: {why}")

    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            fail(name, "no spark output");  n_fail += 1; continue
        try:
            spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
            duck_df = canon(con.execute(sql).df())
        except Exception as e:
            fail(name, str(e)); n_fail += 1; continue
        if list(spark_df.columns) != list(duck_df.columns):
            fail(name, f"cols {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_fail += 1; continue
        if len(spark_df) != len(duck_df):
            fail(name, f"rows {len(spark_df)} vs {len(duck_df)}")
            n_fail += 1; continue
        ok = True
        hash_risk = []
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            try:
                if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                    equal = ((a.isna() & b.isna()) |
                             (abs(a.astype(float) - b.astype(float)) < 1e-9)).all()
                    # the driver hashes exact bytes: a float column that is
                    # numerically equal but repr-different (signed zero,
                    # last-ulp) passes here yet fails the driver's hash.
                    # Flag it so the flake is self-detected, not
                    # driver-discovered (the t35 class, round 12).
                    if equal and not a.astype(float).astype(str).equals(
                            b.astype(float).astype(str)):
                        hash_risk.append(c)
                else:
                    equal = a.astype(str).equals(b.astype(str))
            except Exception as e:
                equal = False
            if not equal:
                mism = (a.astype(str) != b.astype(str))
                idx = mism[mism].index[:3].tolist()
                fail(name, f"col {c} differs at rows {idx}")
                for i in idx:
                    print(f"    spark={a.iloc[i]!r} duck={b.iloc[i]!r}")
                ok = False
                break
        if ok and hash_risk:
            fail(name, f"HASH-RISK cols {hash_risk}: numerically equal but "
                 "repr-different (signed zero / last ulp) — the driver's "
                 "byte-hash will flake; emit as DECIMAL or integer-scaled")
            n_fail += 1
        elif ok:
            results[name] = f"pass ({len(spark_df)} rows)"
            print(f"PASS {name} ({len(spark_df)} rows)"); n_pass += 1
        else:
            n_fail += 1
    # queries with no oracle entry are recorded, not silently skipped
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in results:
            results[name] = "no-oracle (rows-only check)"
    print(f"== {n_pass} pass / {n_fail} fail ==")
    # merge the bit-stability marks from Verify's self-ledger: when the
    # dump ran under SPARK_GRAFT_STABILITY=1, each query's status note
    # carries " stable"/" UNSTABLE" from the raw-bits rerun under a
    # perturbed shuffle-partition count — fold them into the committed
    # summary so the "N/N bit-stable" claim is auditable from
    # VERIFY_SELF.json alone.
    stability = {}
    try:
        ledger = json.load(open(f"{out_dir}/verify_self.json"))
        for q, note in ledger.get("status", {}).items():
            if note.endswith(" stable"):
                stability[q] = True
            elif note.endswith(" UNSTABLE"):
                stability[q] = False
    except Exception:
        pass
    n_stable = sum(1 for v in stability.values() if v)
    n_unstable = sum(1 for v in stability.values() if not v)
    if stability:
        print(f"== stability: {n_stable} stable / {n_unstable} unstable ==")
    if json_out:
        # `describe --dirty` so a summary generated from an uncommitted
        # tree is distinguishable from one at a clean commit
        try:
            head = subprocess.run(["git", "describe", "--always", "--dirty"],
                                  capture_output=True, text=True).stdout.strip()
        except Exception:
            head = "unknown"
        summary = {"n_pass": n_pass, "n_fail": n_fail,
                   "n_oracles": len(oracle), "git_head": head,
                   "sf_dir": sf_dir, "queries": results}
        if stability:
            summary["n_stable"] = n_stable
            summary["n_unstable"] = n_unstable
            summary["stable"] = {q: stability[q] for q in sorted(stability)}
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {json_out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir", help="testdata dir with the parquet tables")
    ap.add_argument("out_dir", help="graft.Verify output dir")
    ap.add_argument("--json", dest="json_out", default=None,
                    help="also write a machine-readable summary here")
    args = ap.parse_args()
    main(args.sf_dir, args.out_dir, args.json_out)
