#!/usr/bin/env python
"""Boxplots of per-split confusion-matrix cells (TN/FP/FN/TP) per model.

Script equivalent of the reference's confusion_plot.ipynb (SURVEY.md §2 C19),
generalized: instead of hardcoding published matrices in notebook cells, it
consumes the results JSON written by scripts/test_models.py --out (or any
JSON mapping "{model}_split{k}" -> {"conf_mat": [[tn, fp], [fn, tp]]}).

Usage:
  python scripts/test_models.py --calling-path ... --out results.json
  python scripts/confusion_plot.py results.json --out confusion_box.png
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("results_json")
    p.add_argument("--out", default="confusion_box.png")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    with open(args.results_json) as f:
        results = json.load(f)

    per_model = collections.defaultdict(list)
    for key, payload in results.items():
        m = re.match(r"(.+)_split(\d+)$", key)
        if not m or "conf_mat" not in payload:
            continue
        per_model[m.group(1)].append(np.asarray(payload["conf_mat"], float))

    cells = ["TN", "FP", "FN", "TP"]
    idx = {"TN": (0, 0), "FP": (0, 1), "FN": (1, 0), "TP": (1, 1)}
    models = sorted(per_model)
    fig, axes = plt.subplots(1, len(cells), figsize=(4 * len(cells), 4), dpi=120)
    for ax, cell in zip(axes, cells):
        data = [[mat[idx[cell]] for mat in per_model[m]] for m in models]
        ax.boxplot(data, tick_labels=models)
        ax.set_title(cell)
        ax.tick_params(axis="x", rotation=30)
    fig.suptitle("Per-split confusion-matrix cells")
    fig.tight_layout()
    fig.savefig(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
