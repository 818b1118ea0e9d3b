"""SELL-C-sigma (SCS) storage format.

TPU-native re-design of the reference's ``ScsData`` + ``convert_to_scs``
(classes_structs.hpp:1313-1470, utilities.hpp:1842-2104). Semantics are kept
identical (sigma-window descending-nnz row sort, chunk padding, column-major
element layout within a chunk, shared fixed permutation for adaptive
precision) but the implementation is vectorized numpy, and the layout is the
basis for the tiled device representation in ops/device_format.py.

Degenerate cases (reference README): C=1, sigma=1 => CRS; C=n_rows => ELL;
sigma=1, C>1 => SELL-P.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from .coo import MtxData, generate_inv_perm


@dataclasses.dataclass
class ScsData:
    """SELL-C-sigma matrix (reference ScsData, classes_structs.hpp:1313).

    Element ``e`` of chunk ``c`` at row-slot ``i`` (0 <= i < C) and running
    column position ``j`` lives at flat index
    ``chunk_ptrs[c] + j*C + i`` — column-major within the chunk.
    """

    C: int
    sigma: int
    n_rows: int
    n_rows_padded: int
    n_chunks: int
    n_elements: int  # nnz + explicit zero padding
    nnz: int
    chunk_ptrs: np.ndarray  # int32 [n_chunks + 1]
    chunk_lengths: np.ndarray  # int32 [n_chunks]
    col_idxs: np.ndarray  # int32 [n_elements]
    values: np.ndarray  # [n_elements]
    old_to_new_idx: np.ndarray  # int32 [n_rows] -> [0, n_rows_padded)
    new_to_old_idx: np.ndarray  # int32 [n_rows_padded], -1 at padded slots
    n_cols: int = 0
    # nnz per *permuted* row — distinguishes structural zero-padding
    # elements from stored zeros (needed by the halo analyzer)
    row_counts_new: Optional[np.ndarray] = None

    @property
    def beta(self) -> float:
        """Fill efficiency nnz/n_elements (reference main.cpp:693)."""
        return self.nnz / self.n_elements if self.n_elements else 1.0

    @property
    def fill_in_percent(self) -> float:
        """(n_elements/nnz - 1) * 100 (reference main.cpp:690-712)."""
        return (self.n_elements / self.nnz - 1.0) * 100.0 if self.nnz else 0.0

    def memory_footprint_bytes(self) -> int:
        """values + chunk_ptrs + chunk_lengths + col_idxs bytes
        (reference main.cpp:655-668, x/y accounted by the harness)."""
        return int(
            self.values.nbytes
            + self.chunk_ptrs.nbytes
            + self.chunk_lengths.nbytes
            + self.col_idxs.nbytes
        )

    # -- element coordinate helpers (host-side, tests/debugging) -----------

    def flat_row_idx(self) -> np.ndarray:
        """Permuted row index of every flat element (padding included)."""
        rows = np.empty(self.n_elements, dtype=np.int32)
        for c in range(self.n_chunks):
            lo, hi = self.chunk_ptrs[c], self.chunk_ptrs[c + 1]
            span = np.arange(lo, hi, dtype=np.int64)
            rows[lo:hi] = (c * self.C + (span - lo) % self.C).astype(np.int32)
        return rows

    def element_coords(self):
        """(chunk, j, i) of every flat element, vectorized.

        O(n_elements) with a searchsorted — prefer :meth:`nonpad_index`
        for anything per-REAL-element: at C=1024 with heavy rows,
        n_elements can be hundreds of times nnz (every chunk pads to its
        longest row), and this method cost minutes where nonpad_index
        costs milliseconds (measured 140 s at 200k rows)."""
        cp = self.chunk_ptrs.astype(np.int64)
        e = np.arange(self.n_elements, dtype=np.int64)
        chunk = np.searchsorted(cp, e, side="right") - 1
        off = e - cp[chunk]
        return chunk, off // self.C, off % self.C

    def nonpad_index(self):
        """(flat_idx, perm_row) of every NON-padding element, O(nnz).

        flat positions of row r (permuted space) are
        ``chunk_ptrs[c] + j*C + (r % C)`` for j < row_counts_new[r] —
        enumerated directly from the per-row counts, never touching the
        padded extent."""
        if self.row_counts_new is None:
            raise ValueError("row_counts_new not recorded for this ScsData")
        cnt = self.row_counts_new.astype(np.int64)
        rows = np.repeat(
            np.arange(cnt.size, dtype=np.int64), cnt
        )
        # j index within each row: 0..cnt[r]-1 via the cumsum trick
        ends = np.cumsum(cnt)
        j = np.arange(int(ends[-1]) if cnt.size else 0, dtype=np.int64)
        j -= np.repeat(ends - cnt, cnt)
        base = self.chunk_ptrs.astype(np.int64)[rows // self.C] + rows % self.C
        return base + j * self.C, rows

    def padding_mask(self) -> np.ndarray:
        """True at structural zero-padding elements (j beyond the row's
        nnz count)."""
        if self.row_counts_new is None:
            raise ValueError("row_counts_new not recorded for this ScsData")
        idx, _rows = self.nonpad_index()
        mask = np.ones(self.n_elements, dtype=bool)
        mask[idx] = False
        return mask

    def to_dense(self) -> np.ndarray:
        """Dense (n_rows, n_cols) reconstruction in original row order."""
        dense = np.zeros((self.n_rows_padded, self.n_cols), dtype=np.float64)
        rows = self.flat_row_idx()
        np.add.at(
            dense, (rows, self.col_idxs), self.values.astype(np.float64)
        )
        out = np.zeros((self.n_rows, self.n_cols), dtype=np.float64)
        valid = self.new_to_old_idx >= 0
        out[self.new_to_old_idx[valid]] = dense[valid]
        return out

    def spmv_reference(self, x: np.ndarray) -> np.ndarray:
        """Trivially-correct host SpMV in *permuted* row order.

        x is indexed by col_idxs directly (i.e. x must already be laid out
        in whatever order col_idxs refers to). Returns y[n_rows_padded].
        """
        x = np.asarray(x)
        y = np.zeros((self.n_rows_padded,) + x.shape[1:], dtype=np.float64)
        contrib = self.values.astype(np.float64)[
            (slice(None),) + (None,) * (x.ndim - 1)
        ] * x.astype(np.float64)[self.col_idxs]
        np.add.at(y, self.flat_row_idx(), contrib)
        return y

    def to_crs(self):
        """(row_ptrs, col_idxs, values) view when C == 1 (CRS degenerate).

        With C=1 each chunk is one row and the flat layout is exactly CRS
        except rows are padded to >=0 length with explicit zeros when empty.
        """
        if self.C != 1:
            raise ValueError("to_crs requires C == 1")
        return (
            self.chunk_ptrs.copy(),
            self.col_idxs.copy(),
            self.values.copy(),
        )

    def write_to_mtx_file(self, path: str, col_unperm=None) -> None:
        """Dump the (padded) SCS structure back to MatrixMarket, original row
        order, dropping explicit padding (reference OUTPUT_SPARSITY /
        ScsData::write_to_mtx_file, classes_structs.hpp:1758-1790).

        ``col_unperm`` (new->old) inverts a prior symmetric column
        permutation (permute_scs_cols) so the dump is in original indices.
        """
        from ..io.mmio import write_mtx

        rows = self.flat_row_idx()
        # padding elements have value 0 AND were never written; real zeros
        # cannot be distinguished, so (like the reference, which writes only
        # nonzeros it finds) we drop exact zeros.
        keep = self.values.astype(np.float64) != 0.0
        keep &= self.new_to_old_idx[rows] >= 0
        orig_rows = self.new_to_old_idx[rows[keep]]
        cols = self.col_idxs[keep]
        if col_unperm is not None:
            cols = np.asarray(col_unperm, dtype=np.int32)[cols]
        write_mtx(
            path,
            MtxData.from_arrays(
                orig_rows,
                cols,
                self.values[keep],
                n_rows=self.n_rows,
                n_cols=self.n_cols,
            ),
        )

    def equal_structure(self, other: "ScsData") -> bool:
        """Structural equality (reference ScsData::operator==,
        classes_structs.hpp:1341-1469)."""
        return (
            self.C == other.C
            and self.sigma == other.sigma
            and self.n_rows == other.n_rows
            and self.n_chunks == other.n_chunks
            and self.n_elements == other.n_elements
            and np.array_equal(self.chunk_ptrs, other.chunk_ptrs)
            and np.array_equal(self.chunk_lengths, other.chunk_lengths)
            and np.array_equal(self.col_idxs, other.col_idxs)
            and np.array_equal(self.values, other.values)
            and np.array_equal(self.old_to_new_idx, other.old_to_new_idx)
        )


def convert_to_scs(
    mtx: MtxData,
    C: int,
    sigma: int,
    dtype=None,
    fixed_permutation: Optional[np.ndarray] = None,
    native: Optional[bool] = None,
) -> ScsData:
    """COO -> SELL-C-sigma (reference convert_to_scs, utilities.hpp:1842-2104).

    Steps (identical semantics, vectorized):
      1. n_chunks = ceil(n_rows/C); pad rows to n_rows_padded = n_chunks*C
         with empty rows;
      2. per sigma-window [i, i+sigma) over the padded row range, sort rows
         by descending nnz (stable; the reference's std::sort is unstable,
         so exact tie order is unspecified there — outputs are validated via
         y, not array equality, for sigma > 1, SURVEY.md §7);
      3. or, if ``fixed_permutation`` (old->new) is given, use it verbatim —
         used to force adaptive-precision sub-matrices to share the primary
         matrix's permutation (reference main.cpp:1170-1221);
      4. chunk_lengths[c] = max row length in chunk; chunk_ptrs = exclusive
         cumsum of chunk_lengths*C;
      5. scatter nonzeros to chunk_ptrs[c] + k*C + (row_new % C), preserving
         the input (row-sorted) order within each row; padding slots hold
         value 0 at column 0.
    """
    if C < 1 or sigma < 1:
        raise ValueError("C and sigma must be >= 1")
    if native is not False:
        from ..native import convert_to_scs_native

        out = convert_to_scs_native(
            mtx, C, sigma, dtype=dtype, fixed_permutation=fixed_permutation
        )
        if out is not None:
            return out
        if native is True:
            raise RuntimeError("native host library unavailable")
    n_rows = mtx.n_rows
    n_chunks = (n_rows + C - 1) // C
    n_rows_padded = n_chunks * C

    counts = np.zeros(n_rows_padded, dtype=np.int64)
    if mtx.nnz:
        counts[: n_rows] = np.bincount(mtx.I, minlength=n_rows)[:n_rows]

    if fixed_permutation is not None:
        old_to_new = np.asarray(fixed_permutation, dtype=np.int32)
        if old_to_new.shape[0] < n_rows:
            raise ValueError("fixed_permutation shorter than n_rows")
        old_to_new = old_to_new[:n_rows]
        counts_new = np.zeros(n_rows_padded, dtype=np.int64)
        counts_new[old_to_new] = counts[:n_rows]
        counts_sorted = counts_new
    else:
        order = np.empty(n_rows_padded, dtype=np.int64)
        for lo in range(0, n_rows_padded, sigma):
            hi = min(lo + sigma, n_rows_padded)
            window = counts[lo:hi]
            # descending by count, stable on original index
            order[lo:hi] = lo + np.argsort(-window, kind="stable")
        counts_sorted = counts[order]
        old_to_new = np.empty(n_rows_padded, dtype=np.int32)
        old_to_new[order] = np.arange(n_rows_padded, dtype=np.int32)
        old_to_new = old_to_new[:n_rows]

    chunk_lengths = (
        counts_sorted.reshape(n_chunks, C).max(axis=1).astype(np.int32)
    )
    chunk_ptrs = np.zeros(n_chunks + 1, dtype=np.int64)
    np.cumsum(chunk_lengths.astype(np.int64) * C, out=chunk_ptrs[1:])
    n_elements = int(chunk_ptrs[-1])
    if n_elements > np.iinfo(np.int32).max:
        raise OverflowError(
            "SCS element count exceeds int32 (reference overflow guard, "
            "utilities.hpp:105-190)"
        )
    chunk_ptrs = chunk_ptrs.astype(np.int32)

    out_dtype = dtype if dtype is not None else mtx.values.dtype
    values = np.zeros(n_elements, dtype=out_dtype)
    col_idxs = np.zeros(n_elements, dtype=np.int32)

    if mtx.nnz:
        rows_new = old_to_new[mtx.I].astype(np.int64)
        # occurrence index k of each element within its (new) row, input
        # order preserved within rows (stable sort <=> reference's in-order
        # scatter with per-row counters)
        sort_e = np.argsort(rows_new, kind="stable")
        rs = rows_new[sort_e]
        boundaries = np.flatnonzero(np.diff(rs)) + 1
        starts = np.concatenate(([0], boundaries))
        group_id = np.zeros(rs.size, dtype=np.int64)
        group_id[boundaries] = 1
        group_id = np.cumsum(group_id)
        k_sorted = np.arange(rs.size, dtype=np.int64) - starts[group_id]
        k = np.empty(rs.size, dtype=np.int64)
        k[sort_e] = k_sorted

        idx = (
            chunk_ptrs[(rows_new // C)].astype(np.int64)
            + k * C
            + rows_new % C
        )
        values[idx] = mtx.values.astype(out_dtype)
        col_idxs[idx] = mtx.J

    new_to_old = np.full(n_rows_padded, -1, dtype=np.int32)
    new_to_old[old_to_new] = np.arange(n_rows, dtype=np.int32)

    return ScsData(
        C=int(C),
        sigma=int(sigma),
        n_rows=n_rows,
        n_rows_padded=n_rows_padded,
        n_chunks=n_chunks,
        n_elements=n_elements,
        nnz=mtx.nnz,
        chunk_ptrs=chunk_ptrs,
        chunk_lengths=chunk_lengths,
        col_idxs=col_idxs,
        values=values,
        old_to_new_idx=old_to_new.astype(np.int32),
        new_to_old_idx=new_to_old,
        n_cols=mtx.n_cols,
        row_counts_new=counts_sorted.astype(np.int32),
    )


@dataclasses.dataclass
class CompactScs:
    """Padded-extent-free SELL-C-sigma view for the transpose-stream
    build: chunk geometry + per-permuted-row compact (cols, values).

    At C=1024 with pareto row lengths the PADDED element count of the
    intermediate SCS reaches ~120x nnz (448M elements on
    RandomImbalanced-500k), and materializing/copying those arrays cost
    ~560 s of the 644 s operator build (round-5 profile) — the arrays
    were only ever a container the packers read back through
    nonpad_index. This stores exactly the real elements (grouped by
    permuted row, input order within a row — the same per-element order
    the padded layout enumerates) plus the chunk geometry the padded
    layout WOULD have, so beta reporting and the packers see identical
    semantics. Reference format contract: classes_structs.hpp:1313-1470
    (the reference always materializes; its C/sigma campaign never pads
    pathologically because sigma-sorting exists for exactly this, while
    the tstream tier's load-balancing permutation must not sigma-sort)."""

    C: int
    sigma: int
    n_rows: int
    n_rows_padded: int
    n_chunks: int
    n_elements: int  # what the padded layout WOULD hold (beta accounting)
    nnz: int
    chunk_lengths: np.ndarray  # int64 [n_chunks]
    row_counts_new: np.ndarray  # int32 [n_rows_padded]
    row_ptrs: np.ndarray  # int64 [n_rows_padded + 1] into cols/values
    cols: np.ndarray  # int32 [nnz], grouped by permuted row
    values: np.ndarray  # [nnz]
    old_to_new_idx: np.ndarray
    new_to_old_idx: np.ndarray
    n_cols: int = 0

    @property
    def beta(self) -> float:
        return self.nnz / self.n_elements if self.n_elements else 1.0

    @property
    def fill_in_percent(self) -> float:
        return (self.n_elements / self.nnz - 1.0) * 100.0 if self.nnz else 0.0

    def memory_footprint_bytes(self) -> int:
        return int(self.values.nbytes + self.cols.nbytes
                   + self.chunk_lengths.nbytes + self.row_ptrs.nbytes)


def convert_to_scs_compact(
    mtx: MtxData,
    C: int,
    fixed_permutation: np.ndarray,
    dtype=None,
) -> CompactScs:
    """COO -> CompactScs under a caller-supplied permutation (the
    transpose-stream balance permutation). Same row/element semantics as
    :func:`convert_to_scs` with ``fixed_permutation`` — sigma is
    irrelevant under a fixed permutation — without materializing the
    padded arrays."""
    if C < 1:
        raise ValueError("C must be >= 1")
    n_rows = mtx.n_rows
    n_chunks = (n_rows + C - 1) // C
    n_rows_padded = n_chunks * C
    old_to_new = np.asarray(fixed_permutation, dtype=np.int32)
    if old_to_new.shape[0] < n_rows:
        raise ValueError("fixed_permutation shorter than n_rows")
    old_to_new = old_to_new[:n_rows]

    counts = np.zeros(n_rows_padded, dtype=np.int64)
    if mtx.nnz:
        counts[:n_rows] = np.bincount(mtx.I, minlength=n_rows)[:n_rows]
    counts_new = np.zeros(n_rows_padded, dtype=np.int64)
    counts_new[old_to_new] = counts[:n_rows]

    chunk_lengths = counts_new.reshape(n_chunks, C).max(axis=1)
    n_elements = int((chunk_lengths * C).sum())

    rows_new = old_to_new[mtx.I].astype(np.int64)
    order = np.argsort(rows_new, kind="stable")  # in-row order preserved
    row_ptrs = np.zeros(n_rows_padded + 1, dtype=np.int64)
    np.cumsum(counts_new, out=row_ptrs[1:])

    out_dtype = dtype if dtype is not None else mtx.values.dtype
    new_to_old = np.full(n_rows_padded, -1, dtype=np.int32)
    new_to_old[old_to_new] = np.arange(n_rows, dtype=np.int32)
    return CompactScs(
        C=int(C),
        sigma=1,
        n_rows=n_rows,
        n_rows_padded=n_rows_padded,
        n_chunks=n_chunks,
        n_elements=n_elements,
        nnz=mtx.nnz,
        chunk_lengths=chunk_lengths,
        row_counts_new=counts_new.astype(np.int32),
        row_ptrs=row_ptrs,
        cols=np.ascontiguousarray(mtx.J[order], dtype=np.int32),
        values=np.ascontiguousarray(mtx.values[order], dtype=out_dtype),
        old_to_new_idx=old_to_new,
        new_to_old_idx=new_to_old,
        n_cols=mtx.n_cols,
    )


def sigma_window_perm(
    row_counts: np.ndarray, n_rows: int, C: int, sigma: int
) -> tuple:
    """Logical SELL-C-sigma row permutation from row nnz counts alone (no
    conversion): rows padded to ceil(n_rows/C)*C, sorted descending by count
    within each sigma-window (stable on ties — reference utilities.hpp:
    1930-1942 uses std::sort, so exact tie order is unspecified there).

    Returns ``(old_to_new_full [n_rows_padded] int32, n_rows_padded)``.
    Used by the re-tiling engine (runtime/operator.py): the user's (C,
    sigma) defines the row order and the reported beta while execution
    packs the permuted rows into physical 1024-row lane-tile chunks.
    """
    n_chunks = (n_rows + C - 1) // C
    n_rows_padded = n_chunks * C
    counts = np.zeros(n_rows_padded, dtype=np.int64)
    counts[:n_rows] = np.asarray(row_counts[:n_rows], dtype=np.int64)
    order = np.empty(n_rows_padded, dtype=np.int64)
    for lo in range(0, n_rows_padded, sigma):
        hi = min(lo + sigma, n_rows_padded)
        order[lo:hi] = lo + np.argsort(-counts[lo:hi], kind="stable")
    old_to_new = np.empty(n_rows_padded, dtype=np.int32)
    old_to_new[order] = np.arange(n_rows_padded, dtype=np.int32)
    return old_to_new, n_rows_padded


def logical_elements(
    row_counts: np.ndarray, old_to_new_full: np.ndarray, C: int
) -> int:
    """Element count (nnz + padding) of the LOGICAL SELL-C-sigma format a
    matrix with these per-row nnz counts would occupy under the given full
    row permutation — i.e. the denominator of the reported beta
    (reference main.cpp:693), computed without materializing the arrays."""
    n_rows_padded = old_to_new_full.shape[0]
    assert n_rows_padded % C == 0
    cs = np.zeros(n_rows_padded, dtype=np.int64)
    n = min(len(row_counts), n_rows_padded)
    cs[np.asarray(old_to_new_full[:n])] = np.asarray(
        row_counts[:n], dtype=np.int64
    )
    return int(cs.reshape(-1, C).max(axis=1).sum()) * C


def convert_to_scs_retiled(
    mtx: MtxData,
    C_log: int,
    sigma_log: int,
    dtype=None,
    fixed_logical_perm: Optional[np.ndarray] = None,
    C_phys: int = 1024,
) -> tuple:
    """COO -> physical SELL-C_phys-1 carrying the LOGICAL SELL-C-sigma row
    order (the re-tiling engine). The user's (C, sigma) is treated as a
    *logical* format: it defines the row permutation (sigma-window sort)
    and the reported beta, exactly as the reference's C-parametric kernels
    would see it (kernels.hpp:216-301) — but execution packs the permuted
    matrix into physical ``C_phys``-row chunks, the TPU-native 8-sublane x
    128-lane tile. The un-permuted y is identical; only the padding/layout
    differs.

    ``fixed_logical_perm`` forces a caller-supplied full logical
    permutation (adaptive-precision sub-matrices share the primary's,
    reference main.cpp:1170-1221).

    Returns ``(scs_physical, logical_perm_full, logical_n_elements)``.
    """
    counts = np.bincount(mtx.I, minlength=mtx.n_rows).astype(np.int64)
    if fixed_logical_perm is not None:
        lperm = np.asarray(fixed_logical_perm, dtype=np.int32)
        lpad = lperm.shape[0]
        fixed: Optional[np.ndarray] = lperm
        lelems = logical_elements(counts, lperm, C_log)
    else:
        lperm, lpad = sigma_window_perm(counts, mtx.n_rows, C_log, sigma_log)
        fixed = None if sigma_log == 1 else lperm
        lelems = logical_elements(counts, lperm, C_log)
        if fixed is not None:
            # The execution row order is free (y is un-permuted through
            # old_to_new either way; beta above stays the LOGICAL
            # format's). The sigma sort only helps when it tightens the
            # PHYSICAL C_phys-chunk padding; on structured matrices it
            # instead scrambles the diagonal the gather windows ride
            # (measured ~11% on Laplace3D at sigma=512). Keep whichever
            # order needs fewer physical tiles.
            phys_pad = -(-mtx.n_rows // C_phys) * C_phys
            cid = np.zeros(phys_pad, dtype=np.int64)
            cid[: mtx.n_rows] = counts
            tiles_id = int(cid.reshape(-1, C_phys).max(axis=1).sum())
            both_pad = -(-lpad // C_phys) * C_phys
            csig = np.zeros(both_pad, dtype=np.int64)
            csig[lperm[: mtx.n_rows]] = counts
            tiles_sig = int(csig.reshape(-1, C_phys).max(axis=1).sum())
            if tiles_id <= tiles_sig:
                fixed = None
                # secondaries (AP) must share the EXECUTION order
                lperm = np.arange(phys_pad, dtype=np.int32)
                lpad = phys_pad
    m = mtx if dtype is None else mtx.astype(dtype)
    if fixed is not None and lpad > m.n_rows:
        # rows can land beyond ceil(n_rows/C_phys)*C_phys when the logical
        # padding exceeds the physical one (C_log > C_phys, e.g. ELL);
        # extend with empty rows so the fixed permutation stays in range
        m = MtxData.from_arrays(
            m.I, m.J, m.values, n_rows=lpad, n_cols=m.n_cols
        )
    scs = convert_to_scs(m, C_phys, 1, fixed_permutation=fixed)
    return scs, lperm, lelems


def permute_scs_cols(scs: ScsData, perm: np.ndarray) -> None:
    """Symmetric column permutation: col_idxs[e] = perm[col_idxs[e]]
    (reference permute_scs_cols, utilities.hpp:1802-1831). ``perm`` must
    cover every column value present, including padding column 0 — padding
    values are zero so remapping the padding column is harmless, exactly as
    in the reference."""
    scs.col_idxs = np.asarray(perm, dtype=np.int32)[scs.col_idxs]
