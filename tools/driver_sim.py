"""Full driver-contract simulation (VERDICT r3 item 3).

Reproduces what the grading driver does — fresh Ray session, entry()
smoke, every queries()[name](sf_dir) vs oracle_sql()[name] in DuckDB —
with the FULL compare (row count + schema-kind + order-insensitive
value hash, columns sorted by name, floats rounded to 6 dp), not just
row counts. Writes the per-query JSON artifact in-tree so each round
has a correctness record covering the CURRENT catalog, not last
round's (CORRECTNESS_r{N}.json lags by a round).

Usage:
    python tools/driver_sim.py                       # full catalog at sf0.01
    python tools/driver_sim.py --only q_a,q_b        # subset
    python tools/driver_sim.py --sf /root/testdata/sf0.001
    python tools/driver_sim.py --out CORRECTNESS_SIM.json --skip-entry

Owns the Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _canon_frame(df):
    """Canonical (schema_sig, value_hash) mirroring the driver compare:
    columns sorted by name, floats rounded to 6 dp, rows sorted."""
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)
    kinds = []
    for c in df.columns:
        k = df[c].dtype.kind
        # the driver compares logical shape: int-ish, float, bool, str,
        # datetime, other-object — not exact widths
        kinds.append(
            {"i": "i", "u": "i", "f": "f", "b": "b", "M": "M", "m": "m"}.get(k, "O")
        )
        if k == "f":
            df[c] = df[c].round(6)
    schema_sig = ",".join(f"{c}:{k}" for c, k in zip(df.columns, kinds))
    cells = df.astype(str)
    rows = sorted(map("\x1f".join, cells.values.tolist()))
    h = hashlib.sha256("\x1e".join(rows).encode()).hexdigest()
    return schema_sig, h


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--out", default="CORRECTNESS_SIM.json")
    ap.add_argument("--skip-entry", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=8)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    os.chdir(repo)

    import duckdb
    import pandas as pd
    import pyarrow as pa

    import ray

    ray.init(
        address="local",
        num_cpus=args.num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
        ignore_reinit_error=True,
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as m

    t0 = time.time()
    report: dict[str, dict] = {}
    if not args.skip_entry:
        df = m.entry()
        print(f"entry(): {len(df)} rows", flush=True)
        assert len(df) > 0

    qs, osql = m.queries(), m.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    names = sorted(qs)
    if args.only:
        want = {s.strip() for s in args.only.split(",") if s.strip()}
        missing = want - set(names)
        if missing:
            print(f"unknown queries: {sorted(missing)}")
            return 2
        names = sorted(want)

    n_pass = n_rows_only = n_fail = 0
    for name in names:
        rec: dict = {}
        tq = time.time()
        try:
            ours = qs[name](args.sf)
            if isinstance(ours, pa.Table):
                ours = ours.to_pandas()
            elif not isinstance(ours, pd.DataFrame):
                ours = ours.to_pandas()  # Dataset
            rec["spark_rows"] = int(len(ours))
            if name in osql:
                ref = con.execute(osql[name]).fetchdf()
                rec["oracle_rows"] = int(len(ref))
                rec["rows_match"] = len(ours) == len(ref)
                s_a, h_a = _canon_frame(ours)
                s_b, h_b = _canon_frame(ref)
                rec["schema_match"] = s_a == s_b
                rec["hash_match"] = h_a == h_b
                if not rec["schema_match"]:
                    rec["schema_ours"], rec["schema_oracle"] = s_a, s_b
                ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
                n_pass += ok
                n_fail += not ok
                status = "OK" if ok else "FAIL"
            else:
                rec["rows_only"] = True
                n_rows_only += 1
                status = "OK(rows-only)"
            rec["err"] = None
        except Exception as e:  # noqa: BLE001 - record, don't abort the sweep
            rec["err"] = f"{type(e).__name__}: {e}"
            n_fail += 1
            status = "ERR"
        rec["sec"] = round(time.time() - tq, 2)
        report[name] = rec
        print(f"{status:14s} {name}  ({rec['sec']}s)"
              + ("" if rec["err"] is None else f"  {rec['err']}"), flush=True)

    summary = {
        "sf_dir": args.sf,
        "num_cpus": args.num_cpus,
        "n_queries": len(names),
        "n_oracle_pass": n_pass,
        "n_rows_only": n_rows_only,
        "n_fail": n_fail,
        "wall_sec": round(time.time() - t0, 1),
    }
    out = {"_summary": summary, **report}
    with open(os.path.join(repo, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary))
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
