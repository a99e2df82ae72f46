#!/usr/bin/env python
"""ETL throughput benchmark at realistic data volume (round-5 debt).

The reference's most expensive phase is the 00_data scan — a 270M-row
CHARTEVENTS full pass with a per-row ``DataFrame.apply``
(``00_data.py:129``).  This script demonstrates the rebuild's ETL at volume:

1. generates a scaled raw MIMIC on disk (csv.gz;
   ``write_raw_mimic_scaled`` — default 20M CHARTEVENTS rows + proportional
   LABEVENTS/input/output events over 3,000 subjects),
2. runs the FULL ``run_etl`` twice in fresh subprocesses — native C++
   streaming aggregator ON vs OFF (pandas) — recording wall-clock, peak RSS
   and the per-table rows/sec timing lines,
3. verifies both paths emit identical outputs (byte hash; falls back to a
   numeric max-rel-diff when float formatting differs),
4. prints one JSON summary line for the ladder.

Usage:
    python scripts/bench_etl.py                      # full 20M-row run
    python scripts/bench_etl.py --chartevents_rows 2000000 --subjects 600
    python scripts/bench_etl.py --data_dir /tmp/mimic_scaled --keep

The raw dataset is cached in --data_dir (keyed by a manifest) so repeat runs
skip generation.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import resource
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT_FILES = [
    "final_structured_common.csv", "final_unstructured_common.csv",
    "final_structured_dataset.csv",
    "final_structured_with_feature_set_C_24h_2h_bins.csv",
]


def _child(args) -> None:
    """Run run_etl once and print a JSON result line (fresh process so peak
    RSS is attributable to one path)."""
    from fairmultimodal_tpu.data.etl import run_etl

    use_native = {"on": True, "off": False}[args.child]
    t0 = time.perf_counter()
    stats = run_etl(args.data_dir, args.out_dir, use_native=use_native,
                    timing=True)
    wall = time.perf_counter() - t0
    maxrss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print("CHILD_RESULT " + json.dumps({
        "wall_s": round(wall, 1),
        "maxrss_gb": round(maxrss_gb, 2),
        "timings": stats.get("timings", []),
        "structured_shape": list(stats["structured_shape"]),
        "n_common": stats["n_common"],
    }))


def _run_child(mode: str, data_dir: str, out_dir: str) -> dict:
    cmd = [sys.executable, os.path.abspath(__file__), "--child", mode,
           "--data_dir", data_dir, "--out_dir", out_dir]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr)
        raise SystemExit(f"child ({mode}) failed rc={proc.returncode}")
    for line in proc.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    raise SystemExit(f"child ({mode}) printed no result")


def _hash_outputs(out_dir: str) -> dict:
    hashes = {}
    for f in OUT_FILES:
        p = os.path.join(out_dir, f)
        if os.path.exists(p):
            h = hashlib.sha256()
            with open(p, "rb") as fh:
                for block in iter(lambda: fh.read(1 << 20), b""):
                    h.update(block)
            hashes[f] = h.hexdigest()
    return hashes


def _max_rel_diff(dir_a: str, dir_b: str) -> float:
    import numpy as np
    import pandas as pd

    worst = 0.0
    for f in OUT_FILES:
        a = pd.read_csv(os.path.join(dir_a, f), low_memory=False)
        b = pd.read_csv(os.path.join(dir_b, f), low_memory=False)
        if a.shape != b.shape or list(a.columns) != list(b.columns):
            return float("inf")
        num = a.select_dtypes("number")
        bnum = b[num.columns]
        denom = np.maximum(np.abs(num.to_numpy()), 1e-12)
        d = np.abs(num.to_numpy() - bnum.to_numpy()) / denom
        d = d[np.isfinite(d)]
        if d.size:
            worst = max(worst, float(d.max()))
        obj = a.select_dtypes(exclude="number")
        if not obj.equals(b[obj.columns]):
            return float("inf")
    return worst


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--subjects", type=int, default=3000)
    ap.add_argument("--chartevents_rows", type=int, default=20_000_000)
    ap.add_argument("--data_dir", default="/tmp/mimic_scaled")
    ap.add_argument("--out_dir", default="/tmp/etl_bench_out")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--child", choices=("on", "off"), default=None,
                    help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.child:
        _child(args)
        return 0

    manifest = os.path.join(args.data_dir, "MANIFEST.json")
    want = {"subjects": args.subjects,
            "chartevents_rows": args.chartevents_rows, "seed": args.seed}
    have = None
    if os.path.exists(manifest):
        with open(manifest) as f:
            have = json.load(f)
    if have != want:
        from fairmultimodal_tpu.data.synthetic import write_raw_mimic_scaled

        print(f"Generating scaled raw MIMIC into {args.data_dir}: "
              f"{args.chartevents_rows:,} CHARTEVENTS rows, "
              f"{args.subjects:,} subjects ...", flush=True)
        t0 = time.perf_counter()
        counts = write_raw_mimic_scaled(
            args.data_dir, n_subjects=args.subjects,
            chartevents_rows=args.chartevents_rows, seed=args.seed)
        print(f"Generation: {time.perf_counter() - t0:.0f} s, "
              f"{sum(counts.values()):,} total rows")
        with open(manifest, "w") as f:
            json.dump(want, f)
    else:
        print(f"Reusing cached raw dataset in {args.data_dir}")
    du = subprocess.run(["du", "-sh", args.data_dir], capture_output=True,
                        text=True).stdout.split()[0]

    results = {}
    hashes = {}
    for mode in ("on", "off"):
        out_dir = f"{args.out_dir}_{mode}"
        os.makedirs(out_dir, exist_ok=True)
        print(f"\n=== run_etl, native {mode} ===", flush=True)
        results[mode] = _run_child(mode, args.data_dir, out_dir)
        hashes[mode] = _hash_outputs(out_dir)

    identical = hashes["on"] == hashes["off"] and len(hashes["on"]) == len(OUT_FILES)
    max_rel = 0.0 if identical else _max_rel_diff(
        f"{args.out_dir}_on", f"{args.out_dir}_off")

    summary = {
        "metric": "etl_bench",
        "chartevents_rows": args.chartevents_rows,
        "subjects": args.subjects,
        "raw_size_on_disk": du,
        "native": results["on"],
        "pandas": results["off"],
        "speedup_total": round(results["off"]["wall_s"]
                               / max(results["on"]["wall_s"], 1e-9), 2),
        "outputs_identical": identical,
        "max_rel_diff": max_rel,
    }
    print("\n" + json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
