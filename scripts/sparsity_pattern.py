#!/usr/bin/env python
"""Sparsity-pattern renderer (reference scripts/mm2sparsityPattern.py).

Renders an .mtx (or generator spec) to a density bitmap: PNG via matplotlib
when available, else a portable PGM written with numpy only.

Usage: python scripts/sparsity_pattern.py matrix.mtx [-o out.png] [-b 512]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def density_grid(mtx, bins: int) -> np.ndarray:
    bins = min(bins, max(mtx.n_rows, 1), max(mtx.n_cols, 1))
    r = (mtx.I.astype(np.int64) * bins) // max(mtx.n_rows, 1)
    c = (mtx.J.astype(np.int64) * bins) // max(mtx.n_cols, 1)
    grid = np.zeros((bins, bins), dtype=np.int64)
    np.add.at(grid, (r, c), 1)
    return grid


def write_pgm(path: str, grid: np.ndarray) -> None:
    # log-scaled 8-bit grayscale, nonzero = dark
    g = np.log1p(grid)
    mx = g.max() or 1.0
    img = 255 - (g / mx * 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(f"P5\n{img.shape[1]} {img.shape[0]}\n255\n".encode())
        f.write(img.tobytes())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("matrix")
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument("-b", "--bins", type=int, default=512)
    args = ap.parse_args()

    from uspmv_tpu.cli import load_matrix

    mtx = load_matrix(args.matrix)
    grid = density_grid(mtx, args.bins)
    base = os.path.splitext(os.path.basename(args.matrix))[0] or "matrix"
    out = args.out
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        out = out or f"{base}_sparsity.png"
        fig, ax = plt.subplots(figsize=(6, 6))
        ax.imshow(np.log1p(grid), cmap="Greys", interpolation="nearest")
        ax.set_title(f"{base}: {mtx.n_rows}x{mtx.n_cols}, nnz={mtx.nnz}")
        fig.savefig(out, dpi=150, bbox_inches="tight")
    except ImportError:
        out = out or f"{base}_sparsity.pgm"
        if not out.endswith(".pgm"):
            out = os.path.splitext(out)[0] + ".pgm"
        write_pgm(out, grid)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
