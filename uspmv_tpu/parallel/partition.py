"""1-D row partitioning across the device mesh.

Re-design of the reference's seg_work_sharing_arr (mpi_funcs.hpp:424-622):
build ``work_sharing[n_shards+1]`` — global row-range boundaries per shard.

  seg-rows  : equal row counts                          (:446-465)
  seg-nnz   : boundaries every nnz/n_shards nonzeros    (:466-493)
  seg-metis : graph partitioning. The reference calls METIS_PartGraphKway
              and turns the partition vector into a global symmetric
              permutation (:494-598). METIS isn't available here, so we
              implement the same contract with a dependency-free analogue:
              Cuthill-McKee bandwidth-reducing reordering (which clusters
              connected rows, minimizing the halo cut of a contiguous
              split) followed by an nnz-balanced contiguous split of the
              permuted matrix. Like the reference, the caller receives a
              global permutation that must be applied symmetrically and
              inverted when gathering results.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..formats.coo import MtxData


def _seg_rows(n_rows: int, n_shards: int) -> np.ndarray:
    ws = np.linspace(0, n_rows, n_shards + 1).astype(np.int64)
    return ws


def _seg_nnz(mtx: MtxData, n_shards: int) -> np.ndarray:
    counts = np.bincount(mtx.I, minlength=mtx.n_rows).astype(np.int64)
    cum = np.concatenate(([0], np.cumsum(counts)))
    targets = np.arange(1, n_shards) * (mtx.nnz / n_shards)
    inner = np.searchsorted(cum, targets, side="left")
    ws = np.concatenate(([0], inner, [mtx.n_rows])).astype(np.int64)
    # guard against empty shards (reference guards the empty last rank,
    # mpi_funcs.hpp:602-606). Two passes: force strict increase forward,
    # then clamp backward so every LATER shard can still get >= 1 row
    # (nnz concentrated in the last rows would otherwise push an inner
    # boundary to n_rows and leave trailing shards empty).
    for r in range(1, n_shards + 1):
        ws[r] = max(ws[r], ws[r - 1] + 1)
    for r in range(n_shards, -1, -1):
        ws[r] = min(ws[r], mtx.n_rows - (n_shards - r))
    ws[0] = 0
    return ws


def cuthill_mckee_permutation(mtx: MtxData) -> np.ndarray:
    """Symmetric Cuthill-McKee ordering of the (symmetrized) pattern.
    Returns perm with perm[old] = new. Uses scipy's RCM (reversed back to
    plain CM ordering is unnecessary — RCM is standard)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    A = sp.csr_matrix(
        (np.ones(mtx.nnz, dtype=np.int8), (mtx.I, mtx.J)),
        shape=(mtx.n_rows, mtx.n_cols),
    )
    A = A + A.T
    order = reverse_cuthill_mckee(A.tocsr(), symmetric_mode=True)
    perm = np.empty(mtx.n_rows, dtype=np.int32)
    perm[order] = np.arange(mtx.n_rows, dtype=np.int32)
    return perm


def seg_work_sharing(
    mtx: MtxData, n_shards: int, method: str = "seg-rows"
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Returns (work_sharing[n_shards+1], global_perm or None).

    When a permutation is returned (seg-metis), the caller must permute the
    matrix symmetrically before slicing, and un-permute gathered results
    (reference main.cpp:995-1003).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if mtx.n_rows < n_shards:
        raise ValueError(
            f"cannot partition {mtx.n_rows} rows over {n_shards} shards "
            "(every shard needs at least one row); reduce n_shards"
        )
    if method == "seg-rows":
        return _seg_rows(mtx.n_rows, n_shards), None
    if method == "seg-nnz":
        return _seg_nnz(mtx, n_shards), None
    if method == "seg-metis":
        perm = cuthill_mckee_permutation(mtx)
        permuted = mtx.permute(perm, None).sort_by_row()
        return _seg_nnz(permuted, n_shards), perm
    raise ValueError(f"unknown seg method {method!r}")
