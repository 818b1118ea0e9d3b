"""Scalable synthetic matrix generators.

TPU-native stand-in for the reference's ScaMaC generator bridge
(scamac_generate, utilities.hpp:1585-1752): instead of linking the ScaMaC
library we provide deterministic, scalable generators for the same job —
producing arbitrarily large test/bench matrices without files. Selected by
name, mirroring the reference's ``-scamac <name>`` CLI path.
"""

from __future__ import annotations

import numpy as np

from ..formats.coo import MtxData


def laplace2d(nx: int, ny: int | None = None) -> MtxData:
    """5-point 2-D Laplacian stencil on an nx-by-ny grid (FDM-2d analogue)."""
    ny = ny or nx
    n = nx * ny
    idx = np.arange(n, dtype=np.int64)
    ix, iy = idx % nx, idx // nx
    rows, cols, vals = [idx], [idx], [np.full(n, 4.0)]
    for d, mask in (
        (-1, ix > 0),
        (+1, ix < nx - 1),
        (-nx, iy > 0),
        (+nx, iy < ny - 1),
    ):
        rows.append(idx[mask])
        cols.append(idx[mask] + d)
        vals.append(np.full(mask.sum(), -1.0))
    return MtxData.from_arrays(
        np.concatenate(rows),
        np.concatenate(cols),
        np.concatenate(vals),
        n_rows=n,
        n_cols=n,
    ).sort_by_row()


def laplace3d(nx: int, ny: int | None = None, nz: int | None = None) -> MtxData:
    """7-point 3-D Laplacian stencil."""
    ny = ny or nx
    nz = nz or nx
    n = nx * ny * nz
    idx = np.arange(n, dtype=np.int64)
    ix = idx % nx
    iy = (idx // nx) % ny
    iz = idx // (nx * ny)
    rows, cols, vals = [idx], [idx], [np.full(n, 6.0)]
    for d, mask in (
        (-1, ix > 0),
        (+1, ix < nx - 1),
        (-nx, iy > 0),
        (+nx, iy < ny - 1),
        (-nx * ny, iz > 0),
        (+nx * ny, iz < nz - 1),
    ):
        rows.append(idx[mask])
        cols.append(idx[mask] + d)
        vals.append(np.full(mask.sum(), -1.0))
    return MtxData.from_arrays(
        np.concatenate(rows),
        np.concatenate(cols),
        np.concatenate(vals),
        n_rows=n,
        n_cols=n,
    ).sort_by_row()


def random_banded(n: int, bandwidth: int, nnz_per_row: int, seed: int = 7) -> MtxData:
    """Random matrix with entries clustered in a band — exercises SCS
    sigma-sorting locality like the SuiteSparse FEM matrices."""
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n, dtype=np.int64), nnz_per_row)
    offs = rng.integers(-bandwidth, bandwidth + 1, size=rows.size)
    cols = np.clip(rows + offs, 0, n - 1)
    vals = rng.standard_normal(rows.size)
    # dedupe (row, col) keeping first occurrence
    key = rows * n + cols
    _, first = np.unique(key, return_index=True)
    first.sort()
    return MtxData.from_arrays(
        rows[first], cols[first], vals[first], n_rows=n, n_cols=n
    ).sort_by_row()


def random_imbalanced(n: int, avg_nnz_per_row: int, alpha: float = 1.3, seed: int = 7) -> MtxData:
    """Power-law row lengths — stresses sigma-window sorting & seg-nnz
    partitioning (the workloads the reference's chunk-occupancy machinery
    exists for)."""
    rng = np.random.default_rng(seed)
    raw = rng.pareto(alpha, size=n) + 1.0
    lens = np.maximum(1, (raw / raw.mean() * avg_nnz_per_row)).astype(np.int64)
    lens = np.minimum(lens, n)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    cols = rng.integers(0, n, size=rows.size)
    vals = rng.standard_normal(rows.size)
    key = rows * n + cols
    _, first = np.unique(key, return_index=True)
    first.sort()
    return MtxData.from_arrays(
        rows[first], cols[first], vals[first], n_rows=n, n_cols=n
    ).sort_by_row()


def banded_imbalanced(
    n: int, bandwidth: int = 64, avg_nnz_per_row: int = 8,
    alpha: float = 1.3, seed: int = 7,
) -> MtxData:
    """Banded matrix with power-law row lengths: columns stay within a
    diagonal band (gather-friendly) but row lengths are heavy-tailed —
    the regime where sigma-sorting and heavy-row splitting pay."""
    rng = np.random.default_rng(seed)
    # mostly Poisson(avg) rows with a heavy tail: alpha controls the tail
    # fraction (~0.1% at 1.3) whose rows fill the whole band
    counts = rng.poisson(max(avg_nnz_per_row - 1, 1), n) + 1
    tail = rng.random(n) < 10 ** (-alpha - 1.7)
    counts = np.where(tail, 2 * bandwidth + 1, counts).astype(np.int64)
    counts = np.minimum(counts, 2 * bandwidth + 1)
    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
    offs = rng.integers(-bandwidth, bandwidth + 1, rows.size)
    cols = np.clip(rows + offs, 0, n - 1)
    vals = rng.standard_normal(rows.size)
    # deduplicate (i, j)
    key = rows * n + cols
    _, first = np.unique(key, return_index=True)
    return MtxData.from_arrays(
        rows[first], cols[first], vals[first], n_rows=n, n_cols=n
    ).sort_by_row()


def tridiag(n: int, diag: float = 2.0, off: float = -1.0) -> MtxData:
    idx = np.arange(n, dtype=np.int64)
    rows = np.concatenate([idx, idx[1:], idx[:-1]])
    cols = np.concatenate([idx, idx[1:] - 1, idx[:-1] + 1])
    vals = np.concatenate(
        [np.full(n, diag), np.full(n - 1, off), np.full(n - 1, off)]
    )
    return MtxData.from_arrays(rows, cols, vals, n_rows=n, n_cols=n).sort_by_row()


_GENERATORS = {
    "Laplace2D": laplace2d,
    "Laplace3D": laplace3d,
    "RandomBanded": random_banded,
    "RandomImbalanced": random_imbalanced,
    "BandedImbalanced": banded_imbalanced,
    "Tridiag": tridiag,
}


def generate_matrix(spec: str) -> MtxData:
    """Generate a matrix from a spec string ``Name,arg1,arg2,...``
    (analogue of the reference's ScaMaC argument string,
    utilities.hpp:1585-1752). ScaMaC-style quantum models (Anderson,
    SpinChainXXZ, ... with key=value options) route to io.scamac."""
    parts = spec.split(",")
    name = parts[0]
    if name not in _GENERATORS:
        from .scamac import scamac_generate, scamac_models

        if name.lower() in scamac_models():
            # genuine model errors (bad options, size limits) propagate
            return scamac_generate(spec)
        raise ValueError(
            f"unknown generator {name!r}; available: "
            f"{sorted(_GENERATORS)} + ScaMaC models {sorted(scamac_models())}"
        )
    args = [float(a) if "." in a else int(a) for a in parts[1:]]
    return _GENERATORS[name](*args)
