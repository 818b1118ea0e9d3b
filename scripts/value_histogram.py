#!/usr/bin/env python
"""Nonzero-value and row-length histograms (reference scripts/plot_nz.py +
get_matrix_stats' log-scale histograms). PNG via matplotlib when available,
else an ASCII rendering.

Usage: python scripts/value_histogram.py matrix.mtx [-o out.png]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def ascii_hist(title, centers, counts, width=50):
    print(title)
    mx = counts.max() or 1
    for c, n in zip(centers, counts):
        bar = "#" * int(n / mx * width)
        print(f"  {c:>12.3e} | {bar} {n}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("matrix")
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument("-b", "--bins", type=int, default=40)
    args = ap.parse_args()

    from uspmv_tpu.cli import load_matrix
    from uspmv_tpu.formats.stats import get_matrix_stats

    mtx = load_matrix(args.matrix)
    stats = get_matrix_stats(mtx)
    print(stats.summary())

    vals = np.abs(np.asarray(mtx.values, dtype=np.float64))
    vals = vals[vals > 0]
    log_edges = np.linspace(
        np.log10(vals.min()), np.log10(vals.max()) + 1e-12, args.bins + 1
    )
    vcounts, _ = np.histogram(np.log10(vals), bins=log_edges)
    vcenters = 10 ** ((log_edges[:-1] + log_edges[1:]) / 2)

    rl = np.bincount(mtx.I, minlength=mtx.n_rows)
    redges = np.arange(rl.min(), rl.max() + 2)
    rcounts, _ = np.histogram(rl, bins=redges)

    base = os.path.splitext(os.path.basename(args.matrix))[0] or "matrix"
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        out = args.out or f"{base}_values.png"
        fig, (a1, a2) = plt.subplots(1, 2, figsize=(11, 4))
        a1.bar(range(len(vcounts)), vcounts)
        a1.set_title(f"|a_ij| distribution (log10 bins), nnz={mtx.nnz}")
        a1.set_xlabel("log10 |value| bin")
        a2.bar(redges[:-1], rcounts, width=1.0)
        a2.set_title("row length distribution")
        a2.set_xlabel("nnz per row")
        fig.savefig(out, dpi=130, bbox_inches="tight")
        print(f"wrote {out}")
    except ImportError:
        ascii_hist("|a_ij| histogram (log bins):", vcenters, vcounts)
        nz = rcounts > 0
        ascii_hist("row-length histogram:", redges[:-1][nz], rcounts[nz])
    return 0


if __name__ == "__main__":
    sys.exit(main())
