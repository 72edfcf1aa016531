"""Build the learning-curve parity table: per-100-step means of
avg_score / entropy / explained_var for reference runs (JSONL written by the
actual reference's MetricLogger) vs ours (same keys — deliberate surface
parity). Usage:

    python scripts/parity_table.py REF_JSONL [REF_JSONL2] -- OURS_JSONL [OURS_JSONL2]
"""

import json
import sys
from pathlib import Path


def load(path):
    rows = []
    for line in Path(path).read_text().splitlines():
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "avg_score" in r and "entropy" in r:
            rows.append(r)
    return rows


def bucket_means(rows, width=100, max_step=None):
    out = {}
    for r in rows:
        s = r.get("step")
        if s is None or (max_step and s >= max_step):
            continue
        b = s // width
        out.setdefault(b, []).append(r)
    table = {}
    for b, rs in sorted(out.items()):
        mean = lambda k: sum(float(x.get(k, 0.0)) for x in rs) / len(rs)
        table[b] = (mean("avg_score"), mean("entropy"), mean("explained_var"))
    return table


def fmt(t):
    return f"{t[0]:.0f} / {t[1]:.2f} / {t[2]:+.2f}" if t else "—"


def main():
    argv = sys.argv[1:]
    split = argv.index("--")
    refs = [load(p) for p in argv[:split]]
    ours = [load(p) for p in argv[split + 1:]]
    tables_r = [bucket_means(r) for r in refs]
    tables_o = [bucket_means(o) for o in ours]
    buckets = sorted(set().union(*[set(t) for t in tables_r + tables_o]))
    hdr = ["step"] + [f"ref s{i+1}" for i in range(len(refs))] + \
          [f"ours s{i+1}" for i in range(len(ours))]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for b in buckets:
        row = [f"{b*100}-{b*100+100}"]
        for t in tables_r + tables_o:
            row.append(fmt(t.get(b)))
        print("| " + " | ".join(row) + " |")


if __name__ == "__main__":
    main()
