"""Breakout-rate summary for learning-curve parity (BENCH.md).

Breakout := any 100-step bucket whose mean batch avg_score >= 2000 — the
reference's plateau tops out at ~1,400 (7 seeds) while every post-breakout
run holds >= 2,500, so the threshold separates the two regimes with margin.

Usage: python scripts/breakout_summary.py LABEL=GLOB [LABEL=GLOB ...]
e.g.   python scripts/breakout_summary.py ref='runs/reference_*.jsonl' \
           ours_v2='/tmp/parity2_ours_s*/logs/*.jsonl'
"""

import glob
import json
import sys

THRESHOLD = 2000.0


def buckets(path, width=100):
    rows = []
    for line in open(path):
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "avg_score" in r and r.get("step") is not None:
            rows.append(r)
    out = {}
    for r in rows:
        out.setdefault(r["step"] // width, []).append(r["avg_score"])
    return {k: sum(v) / len(v) for k, v in sorted(out.items())}


def main():
    for spec in sys.argv[1:]:
        label, pattern = spec.split("=", 1)
        paths = sorted(glob.glob(pattern))
        n_break = 0
        print(f"\n== {label} ({len(paths)} runs, breakout = bucket mean >= {THRESHOLD:.0f}) ==")
        for p in paths:
            bm = buckets(p)
            if not bm:
                continue
            steps = (max(bm) + 1) * 100
            mx = max(bm.values())
            first = next((k * 100 for k, v in bm.items() if v >= THRESHOLD), None)
            broke = first is not None
            n_break += broke
            last = bm[max(bm)]
            print(f"  {p}: {steps} steps, peak bucket {mx:.0f}, last {last:.0f}, "
                  f"breakout {'at step ~' + str(first) if broke else 'NO'}")
        if paths:
            print(f"  -> breakout rate: {n_break}/{len(paths)}")


if __name__ == "__main__":
    main()
