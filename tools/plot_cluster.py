#!/usr/bin/env python
"""Scatter-plot clustered geometry (the ``tools/plot_cluster.py`` analog):
reads the CSV written by ``save_clustered_geometry``.

Usage: python tools/plot_cluster.py clustered.csv [out.png]
"""

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main():
    path = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else path.rsplit(".", 1)[0] + ".png"
    data = np.genfromtxt(path, delimiter=",", names=True)
    cols = data.dtype.names
    dims = [c for c in cols if c.startswith("x_")]
    labels = data["cluster"]
    fig = plt.figure(figsize=(7, 6))
    if len(dims) >= 3:
        ax = fig.add_subplot(projection="3d")
        ax.scatter(data["x_0"], data["x_1"], data["x_2"], c=labels, s=4, cmap="tab20")
    else:
        ax = fig.add_subplot()
        ax.scatter(data["x_0"], data["x_1"], c=labels, s=4, cmap="tab20")
    ax.set_title("cluster tree partition")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(out)


if __name__ == "__main__":
    main()
