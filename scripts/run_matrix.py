#!/usr/bin/env python
"""Run the complete reference evaluation matrix on the TPU, resumably.

Every cell = one CLI subprocess (per-problem process isolation keeps the TPU
client fresh across the long sweep); its final JSON line is appended to
``results/matrix.jsonl`` keyed by cell id. Already-recorded cells are
skipped, so the sweep can be re-launched after interruptions.

Protocols per reference test drivers:
  tsp/cvrp/pctsp/op/smtwtp/sop/mkp/rcpsp: T={1,10,20,30,40,50,100}, 20 ants
  mkp_items: T={1,5,10,20,50}; bpp: T={1,5,10,20}   (their test.py values)
  tsp_nls:  T=1..10, 48 ants (tsp_nls/test.py:49-56)
  cvrp_nls: T=1..10, 20 ants (cvrp_nls/test.py:80-96)
All cells use the 100-instance golden test sets (PSPLIB test split for
rcpsp). Usage: python scripts/run_matrix.py [--only PREFIX] [--dry]
"""
import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "results", "matrix.jsonl")

T7 = ["1", "10", "20", "30", "40", "50", "100"]
T5 = ["1", "5", "10", "20", "50"]
T4 = ["1", "5", "10", "20"]
T10 = [str(t) for t in range(1, 11)]


def cells():
    out = []

    def cell(cid, args, timeout=2400):
        out.append((cid, args, timeout))

    # --- generic families, neural + classic --------------------------------
    for prob, scales, ts in [
        ("tsp", (20, 100, 500), T7),
        ("cvrp", (20, 100, 500), T7),
        ("op", (100, 200, 300), T7),
        ("pctsp", (20, 100, 500), T7),
        ("smtwtp", (50, 100, 500), T7),
        ("sop", (20, 50, 100), T7),
        ("mkp", (300, 500), T7),
        ("mkp_items", (300, 500), T5),
        ("bpp", (120,), T4),
    ]:
        for n in scales:
            base = ["test", prob, "-n", str(n), "-t", *ts]
            cell(f"{prob}{n}-neural", base)
            cell(f"{prob}{n}-classic", base + ["--classic"])

    # --- RCPSP (PSPLIB j30/j60/j120 test splits) ---------------------------
    for n, chunk, tmo in [(30, 25, 2400), (60, 10, 3600), (120, 5, 5400)]:
        base = ["test", "rcpsp", "-n", str(n), "-t", *T7,
                "--b-chunk", str(chunk)]
        cell(f"rcpsp{n}-neural", base, tmo)
        cell(f"rcpsp{n}-classic", base + ["--classic"], tmo)

    # --- LS pipelines -------------------------------------------------------
    for n in (100, 500, 1000):
        cell(f"tsp_nls{n}", ["test", "tsp", "-n", str(n), "-a", "48",
                             "--local-search", "nls", "-t", *T10], 5400)
    for n, tmo in [(100, 3600), (500, 7200), (1000, 10800)]:
        cell(f"cvrp_nls{n}", ["test", "cvrp", "-n", str(n),
                              "--local-search", "swapstar", "-t", *T10], tmo)
    return out


def done_ids():
    ids = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                    if "error" not in rec:   # failed cells rerun on resume
                        ids.add(rec["cell"])
                except (json.JSONDecodeError, KeyError):
                    pass
    return ids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="run only cells whose id starts with this prefix")
    ap.add_argument("--dry", action="store_true")
    args = ap.parse_args()

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    skip = done_ids()
    todo = [(c, a, tmo) for c, a, tmo in cells()
            if c not in skip and (args.only is None
                                  or c.startswith(args.only))]
    print(f"{len(todo)} cells to run ({len(skip)} already recorded)",
          flush=True)
    if args.dry:
        for c, a, _ in todo:
            print(c, " ".join(a))
        return

    for cid, cargs, tmo in todo:
        t0 = time.time()
        print(f"[{time.strftime('%H:%M:%S')}] {cid} ...", flush=True)
        try:
            p = subprocess.run(
                [sys.executable, "-m", "deepaco_tpu", *cargs],
                capture_output=True, text=True, timeout=tmo, cwd=ROOT)
        except subprocess.TimeoutExpired:
            print(f"  TIMEOUT after {tmo}s", flush=True)
            with open(OUT, "a") as f:
                f.write(json.dumps({"cell": cid, "error": "timeout",
                                    "timeout_s": tmo}) + "\n")
            continue
        line = None
        for ln in reversed(p.stdout.splitlines()):
            if ln.startswith("{"):
                line = ln
                break
        if p.returncode != 0 or line is None:
            print(f"  FAILED rc={p.returncode}: {p.stderr[-400:]}",
                  flush=True)
            with open(OUT, "a") as f:
                f.write(json.dumps({"cell": cid, "error": "failed",
                                    "rc": p.returncode,
                                    "stderr_tail": p.stderr[-400:]}) + "\n")
            continue
        rec = json.loads(line)
        rec["cell"] = cid
        rec["wall_s"] = round(time.time() - t0, 1)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"  ok in {rec['wall_s']}s: T={rec['t_aco'][-1]} -> "
              f"{rec['means'][-1]:.4f}", flush=True)


if __name__ == "__main__":
    main()
