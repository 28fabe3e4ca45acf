#!/usr/bin/env python
"""Render results/matrix.jsonl into markdown tables for RESULTS.md.

Usage: python scripts/render_results.py > /tmp/matrix.md
"""
import json
import os
import sys
from collections import defaultdict

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "matrix.jsonl")

MAXIMIZE = {"op", "mkp", "mkp_items", "bpp"}


def load():
    recs = {}
    with open(OUT) as f:
        for line in f:
            r = json.loads(line)
            if "error" not in r:
                recs[r["cell"]] = r       # later reruns win
    return recs


def fmt(v):
    return f"{v:.3f}" if abs(v) < 1000 else f"{v:.1f}"


def main():
    recs = load()
    pairs = defaultdict(dict)
    ls_rows = []
    for cell, r in sorted(recs.items()):
        key = cell
        if key.endswith("-backfill"):     # rcpsp gap-filling decoder variant
            key = key[:-len("-backfill")]
            r = dict(r, problem=r["problem"] + " (backfill)")
        if key.endswith("-neural"):
            pairs[key[:-len("-neural")] + r["problem"]]["neural"] = r
        elif key.endswith("-classic"):
            pairs[key[:-len("-classic")] + r["problem"]]["classic"] = r
        else:
            ls_rows.append((cell, r))

    print("| Problem | inst | T | neural (ours) | classic (ours) | wall n/c (s) |")
    print("|---|---|---|---|---|---|")
    for key, d in pairs.items():
        if "neural" not in d and "classic" not in d:
            continue
        some = d.get("neural") or d.get("classic")
        prob = some["problem"]
        arrow = " ↑" if prob in MAXIMIZE else ""
        ts = some["t_aco"]
        show_t = [t for t in (1, 10, 50, ts[-1]) if t in ts]
        idx = [ts.index(t) for t in show_t]

        def cells(r):
            if r is None:
                return "—"
            return " / ".join(fmt(r["means"][i]) for i in idx)

        wall = "{} / {}".format(
            int(d["neural"]["duration_s"]) if "neural" in d else "—",
            int(d["classic"]["duration_s"]) if "classic" in d else "—")
        inst = some.get("instances", 100)
        print(f"| {prob}{some['n']}{arrow} | {inst} | "
              f"{'/'.join(str(t) for t in show_t)} | {cells(d.get('neural'))}"
              f" | {cells(d.get('classic'))} | {wall} |")

    if ls_rows:
        print()
        print("| LS pipeline | inst | T values | mean best | wall (s) |")
        print("|---|---|---|---|---|")
        for cell, r in ls_rows:
            ts = r["t_aco"]
            show_t = [t for t in (1, 3, 5, 10) if t in ts]
            idx = [ts.index(t) for t in show_t]
            vals = " / ".join(fmt(r["means"][i]) for i in idx)
            print(f"| {cell} | {r.get('instances', 100)} | "
                  f"{'/'.join(str(t) for t in show_t)} | {vals} | "
                  f"{int(r['duration_s'])} |")

    missing = [c for c in recs if False]
    errs = []
    with open(OUT) as f:
        seen_ok = set(recs)
        for line in f:
            r = json.loads(line)
            if "error" in r and r["cell"] not in seen_ok:
                errs.append(r["cell"])
    if errs:
        print("\nPending/failed cells:", ", ".join(sorted(set(errs))),
              file=sys.stderr)


if __name__ == "__main__":
    main()
