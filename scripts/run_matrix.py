#!/usr/bin/env python
"""Run the complete reference evaluation matrix on the TPU, resumably.

Cells are the per-problem, per-scale protocol runs of the reference test
drivers (SURVEY §6). Results append to ``results/matrix.jsonl`` keyed by
cell id; already-recorded ok cells are skipped on re-launch.

Execution model (round-3: cut the per-process TPU relay warm-up, measured
~1000s wall for 12s of device work on tsp20):

* SMALL cells (short device programs) run GROUPED — several cells share one
  worker subprocess (``--worker id1,id2,...``) that drives the CLI
  in-process and appends results itself. One TPU client warm-up per group.
* BIG cells (n>=500 horizons, NLS/LS pipelines, rcpsp) stay one-per-process
  for crash isolation.
* Any cell that failed inside a group is retried SOLO afterwards, so a
  poisoned TPU client can't take down its group-mates' results for good.

Usage: python scripts/run_matrix.py [--only PREFIX] [--dry]
"""
import argparse
import contextlib
import io
import json
import os
import subprocess
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "results", "matrix.jsonl")
if ROOT not in sys.path:        # script invocation puts scripts/ first, not
    sys.path.insert(0, ROOT)    # the repo root the worker imports from

from deepaco_tpu.utils.compcache import enable as _enable_cache  # noqa: E402
_enable_cache()

T7 = ["1", "10", "20", "30", "40", "50", "100"]
T5 = ["1", "5", "10", "20", "50"]
T4 = ["1", "5", "10", "20"]
T10 = [str(t) for t in range(1, 11)]

GROUP_SIZE = 10          # cells per worker process (amortize relay stalls)


def cells():
    """[(cell_id, cli_args, timeout_s, small)] for all 58 protocol cells."""
    out = []

    def cell(cid, args, timeout=2400, small=False):
        out.append((cid, args, timeout, small))

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
        ("bpp", (120,), T7),   # full T=100 protocol (round-4: was T<=20)
    ]:
        for n in scales:
            base = ["test", prob, "-n", str(n), "-t", *ts]
            # ALL generic-family cells are short device programs (10-300s
            # measured) — group them: the dominant wall cost is the relay's
            # per-process TPU acquisition stall (up to ~15-25 min, measured
            # sop50-classic 837s / bpp120 25min+ for seconds of device work)
            cell(f"{prob}{n}-neural", base, 2400, True)
            cell(f"{prob}{n}-classic", base + ["--classic"], 2400, True)

    # --- RCPSP (PSPLIB j30/j60/j120 test splits) ---------------------------
    # grouped too: their device programs are chunked (b_chunk) and short;
    # the relay acquisition stall dominates a solo process just the same
    for n, chunk, tmo in [(30, 25, 2400), (60, 10, 3600), (120, 5, 5400)]:
        base = ["test", "rcpsp", "-n", str(n), "-t", *T7,
                "--b-chunk", str(chunk)]
        cell(f"rcpsp{n}-neural", base, tmo, True)
        cell(f"rcpsp{n}-classic", base + ["--classic"], tmo, True)

    # --- LS pipelines (grouped: chunked device programs + host-side LS) ----
    for n in (100, 500, 1000):
        cell(f"tsp_nls{n}", ["test", "tsp", "-n", str(n), "-a", "48",
                             "--local-search", "nls", "-t", *T10], 5400, True)
    for n, tmo in [(100, 3600), (500, 7200), (1000, 10800)]:
        cell(f"cvrp_nls{n}", ["test", "cvrp", "-n", str(n),
                              "--local-search", "swapstar", "-t", *T10],
             tmo, True)
    # the 58th protocol cell (cvrp_nls/utils.py:89-100 writes a 2000-scale
    # golden set; cvrp_nls/test.py:80-96 is the protocol). Round-5: the full
    # 100-instance set — the round-4 engine runs ~26 s/instance (20 in 523 s),
    # so the full set is ~45 min, not the ~5 h that justified the old
    # 20-instance cut.
    cell("cvrp_nls2000",
         ["test", "cvrp", "-n", "2000", "--local-search", "swapstar",
          "-t", *T10], 14400, True)
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


def _git_sha():
    try:
        return subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              cwd=ROOT, capture_output=True,
                              text=True).stdout.strip() or None
    except Exception:
        return None


_SHA = _git_sha()


def _append(rec):
    # stamp every row with the engine revision it ran at, so stale cells are
    # distinguishable from fresh ones (VERDICT r4 weak #6)
    rec.setdefault("sha", _SHA)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def run_worker(cell_ids):
    """In-process driver for a group of cells (one TPU client for all)."""
    from deepaco_tpu import cli

    table = {c: (a, tmo) for c, a, tmo, _ in cells()}
    for cid in cell_ids:
        if cid in done_ids():
            continue
        cargs, _ = table[cid]
        t0 = time.time()
        print(f"[worker {time.strftime('%H:%M:%S')}] {cid} ...", flush=True)
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                cli.main(cargs)
        except (KeyboardInterrupt, SystemExit):
            raise
        except Exception:
            _append({"cell": cid, "error": "failed-in-group",
                     "stderr_tail": traceback.format_exc()[-400:]})
            print(f"  FAILED in-process: {traceback.format_exc(limit=2)}",
                  flush=True)
            continue
        line = None
        for ln in reversed(buf.getvalue().splitlines()):
            if ln.startswith("{"):
                line = ln
                break
        if line is None:
            _append({"cell": cid, "error": "failed-in-group",
                     "stderr_tail": "no JSON line"})
            continue
        rec = json.loads(line)
        rec["cell"] = cid
        rec["wall_s"] = round(time.time() - t0, 1)
        _append(rec)
        t_aco, means = rec.get("t_aco"), rec.get("means")
        if t_aco and means:
            print(f"  ok in {rec['wall_s']}s: T={t_aco[-1]} -> "
                  f"{means[-1]:.4f}", flush=True)
        else:
            print(f"  ok in {rec['wall_s']}s", flush=True)


def run_solo(cid, cargs, tmo):
    t0 = time.time()
    print(f"[{time.strftime('%H:%M:%S')}] {cid} ...", flush=True)
    try:
        p = subprocess.run(
            [sys.executable, "-m", "deepaco_tpu", *cargs],
            capture_output=True, text=True, timeout=tmo, cwd=ROOT)
    except subprocess.TimeoutExpired:
        print(f"  TIMEOUT after {tmo}s", flush=True)
        _append({"cell": cid, "error": "timeout", "timeout_s": tmo})
        return
    line = None
    for ln in reversed(p.stdout.splitlines()):
        if ln.startswith("{"):
            line = ln
            break
    if p.returncode != 0 or line is None:
        print(f"  FAILED rc={p.returncode}: {p.stderr[-400:]}", flush=True)
        _append({"cell": cid, "error": "failed", "rc": p.returncode,
                 "stderr_tail": p.stderr[-400:]})
        return
    rec = json.loads(line)
    rec["cell"] = cid
    rec["wall_s"] = round(time.time() - t0, 1)
    _append(rec)
    t_aco, means = rec.get("t_aco"), rec.get("means")
    if t_aco and means:
        print(f"  ok in {rec['wall_s']}s: T={t_aco[-1]} -> "
              f"{means[-1]:.4f}", flush=True)
    else:
        print(f"  ok in {rec['wall_s']}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="run only cells whose id starts with this prefix")
    ap.add_argument("--dry", action="store_true")
    ap.add_argument("--worker", default=None,
                    help="(internal) comma-separated cell ids to run "
                         "in-process")
    ap.add_argument("--no-group", action="store_true",
                    help="run every cell in its own process (round-2 mode)")
    ap.add_argument("--redo", default=None,
                    help="drop recorded cells matching this prefix from "
                         "matrix.jsonl first, then re-run them (history "
                         "stays in git)")
    args = ap.parse_args()

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    if args.redo:
        kept, dropped = [], 0
        with open(OUT) as f:
            for line in f:
                try:
                    cid = json.loads(line).get("cell", "")
                except json.JSONDecodeError:
                    cid = ""
                if cid.startswith(args.redo):
                    dropped += 1
                else:
                    kept.append(line)
        with open(OUT, "w") as f:
            f.writelines(kept)
        print(f"--redo {args.redo}: dropped {dropped} recorded cells",
              flush=True)
    if args.worker:
        run_worker(args.worker.split(","))
        return

    skip = done_ids()
    todo = [(c, a, tmo, small) for c, a, tmo, small in cells()
            if c not in skip and (args.only is None
                                  or c.startswith(args.only))]
    print(f"{len(todo)} cells to run ({len(skip)} already recorded)",
          flush=True)
    if args.dry:
        for c, a, _, small in todo:
            print(("S " if small else "  ") + c, " ".join(a))
        return

    small = [t for t in todo if t[3] and not args.no_group]
    big = [t for t in todo if not (t[3] and not args.no_group)]

    # ---- grouped pass over small cells ------------------------------------
    for s in range(0, len(small), GROUP_SIZE):
        grp = small[s:s + GROUP_SIZE]
        ids = ",".join(c for c, _, _, _ in grp)
        tmo = sum(t for _, _, t, _ in grp)
        print(f"[group] {ids}", flush=True)
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", ids],
                timeout=tmo, cwd=ROOT)
            if p.returncode != 0:
                print(f"  group exited rc={p.returncode}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"  group TIMEOUT after {tmo}s", flush=True)

    # ---- retry group casualties solo, then big cells ----------------------
    ok = done_ids()
    for cid, cargs, tmo, _ in small:
        if cid not in ok:
            run_solo(cid, cargs, tmo)
    for cid, cargs, tmo, _ in big:
        run_solo(cid, cargs, tmo)


if __name__ == "__main__":
    main()
