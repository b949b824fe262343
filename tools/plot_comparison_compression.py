#!/usr/bin/env python
"""Plot compressor error-vs-rank curves (the
``tools/plot_comparison_compression.py`` analog): reads the CSV written by
``examples/compression_comparison.py``.

Usage: python tools/plot_comparison_compression.py comparison.csv [out.png]
"""

import csv
import sys
from collections import defaultdict

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def main():
    path = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else path.rsplit(".", 1)[0] + ".png"
    curves = defaultdict(lambda: ([], []))
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            xs, ys = curves[row["compressor"]]
            xs.append(int(row["rank"]))
            ys.append(float(row["error"]))
    fig, ax = plt.subplots(figsize=(7, 5))
    for name, (xs, ys) in sorted(curves.items()):
        ax.semilogy(xs, ys, marker="o", ms=3, label=name)
    ax.set_xlabel("rank")
    ax.set_ylabel("relative error")
    ax.legend()
    ax.grid(alpha=0.3)
    ax.set_title("compressor comparison")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(out)


if __name__ == "__main__":
    main()
