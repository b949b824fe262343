#!/usr/bin/env python
"""Draw the H-matrix block picture with per-leaf ranks (the
``tools/plot_hmatrix.py`` analog): reads the CSV written by
``save_leaves_with_rank``.

Usage: python tools/plot_hmatrix.py leaves.csv [out.png]
"""

import csv
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib.patches import Rectangle


def main():
    path = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else path.rsplit(".", 1)[0] + ".png"
    rows = []
    with open(path, newline="") as f:
        r = csv.DictReader(f)
        rows = list(r)
    fig, ax = plt.subplots(figsize=(8, 8))
    M = max(int(x["t_off"]) + int(x["t_size"]) for x in rows)
    N = max(int(x["s_off"]) + int(x["s_size"]) for x in rows)
    for x in rows:
        t0, ts = int(x["t_off"]), int(x["t_size"])
        s0, ss = int(x["s_off"]), int(x["s_size"])
        lr = x["kind"] == "lr"
        color = "#d62728" if not lr else "#2ca02c"
        ax.add_patch(
            Rectangle((s0, t0), ss, ts, facecolor=color, edgecolor="white", lw=0.4,
                      alpha=0.35 if lr else 0.8)
        )
        if lr and ts > 0.02 * M:
            ax.text(s0 + ss / 2, t0 + ts / 2, x["rank"], ha="center",
                    va="center", fontsize=6)
    ax.set_xlim(0, N)
    ax.set_ylim(M, 0)
    ax.set_aspect("equal")
    ax.set_title("H-matrix blocks (red = dense, green = low rank)")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(out)


if __name__ == "__main__":
    main()
