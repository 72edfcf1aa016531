#!/usr/bin/env python
"""Plot learning curves from MetricLogger JSONL files.

Usage: python scripts/plot_curves.py out.png run1.jsonl [run2.jsonl ...]
Each curve: rolling-mean avg_score vs train step (plus eval avg markers).
"""

import json
import sys
from pathlib import Path

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def load(path):
    train, evals = [], []
    for line in Path(path).read_text().splitlines():
        r = json.loads(line)
        if "avg_score" in r:
            train.append((r["step"], r["avg_score"]))
        elif "eval/avg_score" in r:
            evals.append((r["step"], r["eval/avg_score"]))
    return np.asarray(train), np.asarray(evals)


def rolling(x, w):
    if len(x) < w:
        return x
    c = np.cumsum(np.insert(x, 0, 0))
    out = (c[w:] - c[:-w]) / w
    return np.concatenate([x[: w - 1], out])


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    out, files = sys.argv[1], sys.argv[2:]
    fig, ax = plt.subplots(figsize=(9, 5))
    for f in files:
        train, evals = load(f)
        label = Path(f).stem
        if len(train):
            ax.plot(train[:, 0], rolling(train[:, 1], 50), label=label, lw=1.5)
        if len(evals):
            ax.plot(evals[:, 0], evals[:, 1], "o--", ms=4, lw=1,
                    label=f"{label} (eval)")
    ax.set_xlabel("train step")
    ax.set_ylabel("avg episode score")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
