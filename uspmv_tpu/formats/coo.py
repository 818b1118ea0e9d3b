"""COO matrix container and host-side preprocessing.

TPU-native re-design of the reference's ``MtxData`` (classes_structs.hpp:
1169-1238) plus the permutation/scaling helpers from utilities.hpp. All
host-side; arrays are numpy (int32 indices, like the reference's IT=int).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass
class MtxData:
    """A COO sparse matrix (reference MtxData, classes_structs.hpp:1169).

    ``I``/``J`` are int32 row/col indices, ``values`` any float dtype.
    """

    n_rows: int
    n_cols: int
    nnz: int
    is_sorted: bool
    is_symmetric: bool
    I: np.ndarray
    J: np.ndarray
    values: np.ndarray

    @classmethod
    def from_arrays(
        cls,
        I,
        J,
        values,
        n_rows: Optional[int] = None,
        n_cols: Optional[int] = None,
        is_sorted: bool = False,
        is_symmetric: bool = False,
    ) -> "MtxData":
        I = np.asarray(I, dtype=np.int32)
        J = np.asarray(J, dtype=np.int32)
        values = np.asarray(values)
        if n_rows is None:
            n_rows = int(I.max()) + 1 if I.size else 0
        if n_cols is None:
            n_cols = int(J.max()) + 1 if J.size else 0
        return cls(
            n_rows=int(n_rows),
            n_cols=int(n_cols),
            nnz=int(values.size),
            is_sorted=is_sorted,
            is_symmetric=is_symmetric,
            I=I,
            J=J,
            values=values,
        )

    @classmethod
    def from_scipy(cls, mat, is_symmetric: bool = False) -> "MtxData":
        coo = mat.tocoo()
        return cls.from_arrays(
            coo.row,
            coo.col,
            coo.data,
            n_rows=coo.shape[0],
            n_cols=coo.shape[1],
            is_symmetric=is_symmetric,
        )

    def to_scipy(self):
        import scipy.sparse as sp

        return sp.coo_matrix(
            (np.asarray(self.values, dtype=np.float64), (self.I, self.J)),
            shape=(self.n_rows, self.n_cols),
        )

    def astype(self, dtype) -> "MtxData":
        return dataclasses.replace(self, values=self.values.astype(dtype))

    def copy(self) -> "MtxData":
        return dataclasses.replace(
            self, I=self.I.copy(), J=self.J.copy(), values=self.values.copy()
        )

    def sort_by_row(self) -> "MtxData":
        """Stable sort of triplets by row (reference sort_perm,
        utilities.hpp:2139-2146,2269-2290)."""
        perm = np.argsort(self.I, kind="stable")
        return dataclasses.replace(
            self,
            I=self.I[perm],
            J=self.J[perm],
            values=self.values[perm],
            is_sorted=True,
        )

    def row_counts(self) -> np.ndarray:
        return np.bincount(self.I, minlength=self.n_rows).astype(np.int64)

    def permute(self, perm: np.ndarray, inv_perm: np.ndarray) -> "MtxData":
        """Symmetric row+col permutation (reference ScsData::permute analogue
        applied at COO level for seg-metis, mpi_funcs.hpp:494-598).

        ``perm[old] = new`` for rows and columns alike.
        """
        perm = np.asarray(perm, dtype=np.int32)
        return dataclasses.replace(
            self,
            I=perm[self.I],
            J=perm[self.J],
            is_sorted=False,
        )

    def slice_rows(self, row_lo: int, row_hi: int) -> "MtxData":
        """Extract rows [row_lo, row_hi) keeping global column indices
        but local row indices (reference seg_mtx_struct + localize_row_idx,
        mpi_funcs.hpp:636-674,862-877). Requires row-sorted input."""
        mask = (self.I >= row_lo) & (self.I < row_hi)
        return MtxData(
            n_rows=row_hi - row_lo,
            n_cols=self.n_cols,
            nnz=int(mask.sum()),
            is_sorted=self.is_sorted,
            is_symmetric=False,
            I=(self.I[mask] - row_lo).astype(np.int32),
            J=self.J[mask].astype(np.int32),
            values=self.values[mask],
        )


def split_heavy_rows(
    mtx: MtxData, threshold: int
) -> Tuple[MtxData, Optional[np.ndarray]]:
    """Split rows with more than ``threshold`` nonzeros into virtual rows of
    at most ``threshold`` elements appended after the real rows.

    Extension beyond the reference: SELL-C-sigma pads every chunk to its
    longest row, so one power-law row inflates its whole C-row chunk; after
    splitting, row lengths are bounded and the fill stays healthy at any C.
    The caller adds the virtual rows' partial results back into their parent
    rows after each SpMV (cheap: only heavy rows split).

    Returns ``(mtx', parent)`` where ``mtx'`` has
    ``n_rows + n_virtual`` rows (columns untouched) and ``parent[v]`` is the
    real row of virtual row ``n_rows + v`` — or ``(mtx, None)`` when nothing
    splits. Requires row-sorted input (element order within rows preserved).
    """
    if not mtx.is_sorted:
        raise ValueError("split_heavy_rows requires row-sorted input")
    counts = np.bincount(mtx.I, minlength=mtx.n_rows).astype(np.int64)
    if not (counts > threshold).any():
        return mtx, None
    # order elements by (row, col) so each piece covers a CONSECUTIVE column
    # run — pieces then have tight gather windows instead of spanning the
    # parent row's whole column range (row-internal order is free)
    order = np.lexsort((mtx.J, mtx.I))
    mtx = dataclasses.replace(
        mtx, I=mtx.I[order], J=mtx.J[order], values=mtx.values[order]
    )
    # occurrence index k of each element within its row
    starts = np.concatenate(([0], np.cumsum(counts)))
    k = np.arange(mtx.nnz, dtype=np.int64) - starts[mtx.I]
    piece = k // threshold
    n_pieces = (counts + threshold - 1) // threshold
    n_virt_per_row = np.maximum(n_pieces - 1, 0)
    virt_base = mtx.n_rows + np.concatenate(
        ([0], np.cumsum(n_virt_per_row[:-1]))
    )
    new_I = np.where(
        piece == 0, mtx.I.astype(np.int64), virt_base[mtx.I] + piece - 1
    )
    n_virtual = int(n_virt_per_row.sum())
    parent = np.repeat(
        np.arange(mtx.n_rows, dtype=np.int32), n_virt_per_row
    )
    out = MtxData(
        n_rows=mtx.n_rows + n_virtual,
        n_cols=mtx.n_cols,
        nnz=mtx.nnz,
        is_sorted=False,
        is_symmetric=False,
        I=new_I.astype(np.int32),
        J=mtx.J.copy(),
        values=mtx.values.copy(),
    ).sort_by_row()
    return out, parent


FOLD_BLOCK = 1024  # virtual-row alignment block for the prefix-sum fold


def align_split_rows(
    mtx: MtxData, n_real: int, parent: np.ndarray, base: int = -1
) -> Tuple[MtxData, np.ndarray, np.ndarray, int, np.ndarray]:
    """Re-number the virtual rows of a split matrix so the per-parent fold
    can run VECTORIZED instead of as a TPU scatter (XLA lowers scatters to
    ~9 ns/index serial loops; at 100k+ virtual rows that costs more than
    the SpMV itself).

    Layout invariants established (all relative to the virtual region,
    which starts at row ``base`` — default ``n_real``; the distributed
    path passes a COMMON base so one shard_map program can slice every
    shard's region at the same offset):
      * each parent's virtual rows stay CONSECUTIVE and parent-ascending;
      * a parent's run never straddles a FOLD_BLOCK boundary;
      * offset 0 of every block is a reserved dead row (no elements);
      * the region length is padded to a multiple of FOLD_BLOCK.

    With those, block-local inclusive prefix sums cs of the virtual
    partials (one (nb,1024)x(1024,1024) triangular matmul on the MXU) turn
    the fold into per-real-row differences ``cs[e_p] - cs[s_p]`` — i.e. an
    SpMV by a ±1 matrix with <= 2 nnz/row, which the lane-tile kernel runs
    at full fill. Rows without pieces get e = s = 0 (difference 0).

    Returns (mtx', e_idx[n_real], s_idx[n_real], region_len, virt_ids,
    parent') — e/s are REGION-RELATIVE indices; virt_ids are the new
    absolute row ids of the (still parent-ascending) virtual rows and
    parent' their parents, for the scatter-fold fallback.
    """
    if not mtx.is_sorted:
        raise ValueError("align_split_rows requires row-sorted input")
    parent = np.asarray(parent)
    if base < 0:
        base = n_real
    assert base >= n_real, "virtual region cannot overlap real rows"
    n_virtual = mtx.n_rows - n_real
    assert parent.shape[0] == n_virtual
    # run lengths per parent (parent is ascending by construction)
    uniq, run_start = np.unique(parent, return_index=True)
    run_len = np.diff(np.append(run_start, n_virtual))
    if run_len.max(initial=0) >= FOLD_BLOCK:
        raise ValueError(
            "a parent has >= FOLD_BLOCK virtual rows; raise the split "
            "threshold"
        )
    # allocate runs: skip the reserved slot at every block start, bump to
    # the next block when a run would straddle. Batched per BLOCK (a
    # searchsorted finds how many whole runs fit the remaining capacity),
    # which packs identically to the sequential first-fit cursor but in
    # O(n_blocks log n) instead of a Python loop over every run.
    starts = np.empty(uniq.size, dtype=np.int64)
    B = FOLD_BLOCK
    cum = np.concatenate(([0], np.cumsum(run_len)))
    i0 = 0
    blk = 0
    n_runs = uniq.size
    while i0 < n_runs:
        j = int(np.searchsorted(cum, cum[i0] + (B - 1), side="right")) - 1
        j = max(j, i0 + 1)  # every run fits alone (run_len < B enforced)
        starts[i0:j] = blk * B + 1 + (cum[i0:j] - cum[i0])
        blk += 1
        i0 = j
    region_len = blk * B

    # old virtual id (dense, parent-ascending) -> new region position
    new_pos = np.repeat(starts, run_len) + (
        np.arange(n_virtual) - np.repeat(run_start, run_len)
    )
    remap = np.arange(n_real + n_virtual, dtype=np.int64)
    remap[n_real:] = base + new_pos
    new_I = remap[mtx.I]

    e_idx = np.zeros(n_real, dtype=np.int32)
    s_idx = np.zeros(n_real, dtype=np.int32)
    e_idx[uniq] = (starts + run_len - 1).astype(np.int32)
    s_idx[uniq] = (starts - 1).astype(np.int32)

    parent2 = parent  # order preserved (runs move as units, still ascending)
    out = MtxData(
        n_rows=base + region_len,
        n_cols=mtx.n_cols,
        nnz=mtx.nnz,
        is_sorted=False,
        is_symmetric=False,
        I=new_I.astype(np.int32),
        J=mtx.J.copy(),
        values=mtx.values.copy(),
    ).sort_by_row()
    virt_ids = (base + new_pos).astype(np.int64)
    return out, e_idx, s_idx, int(region_len), virt_ids, parent2


# ---------------------------------------------------------------------------
# Permutation helpers (reference utilities.hpp:1755-1831)
# ---------------------------------------------------------------------------


def generate_inv_perm(perm: np.ndarray) -> np.ndarray:
    """inv_perm[perm[i]] = i (reference generate_inv_perm)."""
    perm = np.asarray(perm)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=perm.dtype)
    return inv


def apply_permutation(vec: np.ndarray, perm: np.ndarray) -> np.ndarray:
    """permuted[i] = vec[perm[i]] (reference apply_permutation,
    utilities.hpp:1768-1781)."""
    return np.asarray(vec)[np.asarray(perm)]


def apply_strided_permutation(
    vec: np.ndarray, perm: np.ndarray, stride: int
) -> np.ndarray:
    """Permute a row-major block vector of row-stride ``stride``
    (reference apply_strided_permutation, utilities.hpp:1783-1799)."""
    vec = np.asarray(vec)
    n = perm.size
    out = vec.copy()
    v2 = vec[: n * stride].reshape(n, stride)
    out[: n * stride] = v2[np.asarray(perm)].reshape(-1)
    return out


# ---------------------------------------------------------------------------
# Equilibration (reference utilities.hpp:2605-2684)
# ---------------------------------------------------------------------------


def extract_largest_row_elems(mtx: MtxData) -> np.ndarray:
    """Per-row max |a_ij| (reference extract_largest_row_elems).

    Sized n_cols like the reference (it allocates n_cols for both; rows and
    cols agree because the matrix is square-only, utilities.hpp:2206-2210).
    """
    out = np.zeros(mtx.n_rows, dtype=np.float64)
    np.maximum.at(out, mtx.I, np.abs(mtx.values.astype(np.float64)))
    return out


def extract_largest_col_elems(mtx: MtxData) -> np.ndarray:
    out = np.zeros(mtx.n_cols, dtype=np.float64)
    np.maximum.at(out, mtx.J, np.abs(mtx.values.astype(np.float64)))
    return out


def scale_matrix_rows(mtx: MtxData, largest_row_elems: np.ndarray) -> None:
    mtx.values = (
        mtx.values / largest_row_elems[mtx.I].astype(mtx.values.dtype)
    ).astype(mtx.values.dtype)


def scale_matrix_cols(mtx: MtxData, largest_col_elems: np.ndarray) -> None:
    mtx.values = (
        mtx.values / largest_col_elems[mtx.J].astype(mtx.values.dtype)
    ).astype(mtx.values.dtype)


def equilibrate_matrix(mtx: MtxData) -> Tuple[np.ndarray, np.ndarray]:
    """Row-scale by per-row max |a|, then col-scale the row-scaled matrix by
    its per-col max |a| (reference equilibrate_matrix order,
    utilities.hpp:2670-2684). Returns (largest_row_elems, largest_col_elems)
    as used later by the adaptive-precision partitioner."""
    lr = extract_largest_row_elems(mtx)
    scale_matrix_rows(mtx, lr)
    lc = extract_largest_col_elems(mtx)
    scale_matrix_cols(mtx, lc)
    return lr, lc


def jacobi_scale_matrix(mtx: MtxData) -> np.ndarray:
    """Scale each row by its diagonal element (reference jacobi_scale flag,
    classes_structs.hpp:57). Returns the diagonal."""
    diag = np.zeros(mtx.n_rows, dtype=np.float64)
    on_diag = mtx.I == mtx.J
    diag[mtx.I[on_diag]] = mtx.values[on_diag].astype(np.float64)
    if np.any(diag == 0.0):
        raise ValueError("jacobi_scale: matrix has zero diagonal entries")
    mtx.values = (mtx.values / diag[mtx.I].astype(mtx.values.dtype)).astype(
        mtx.values.dtype
    )
    return diag


def extract_matrix_min_mean_max(mtx: MtxData) -> Tuple[float, float, float]:
    """(min|a|, midpoint, max|a|) — note 'mean' is the min/max midpoint, not
    the average (reference extract_matrix_min_mean_max,
    utilities.hpp:2501-2540)."""
    a = np.abs(mtx.values.astype(np.float64))
    mn = float(a.min()) if a.size else 0.0
    mx = float(a.max()) if a.size else 0.0
    return mn, mn + (mx - mn) / 2.0, mx
