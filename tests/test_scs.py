"""SELL-C-sigma converter tests.

Strategy mirrors the reference test suite (SURVEY.md §4): explicit golden
fixtures for small matrices with edge cases (empty rows/cols), plus
reconstruction (to_dense) and SpMV-output validation against scipy for
sweeps of C x sigma on the bundled matrices.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from uspmv_tpu.formats.coo import MtxData, apply_permutation, generate_inv_perm
from uspmv_tpu.formats.scs import ScsData, convert_to_scs, permute_scs_cols
from uspmv_tpu.io.mmio import read_mtx

from conftest import matrix_path


def dense_mtx(a) -> MtxData:
    return MtxData.from_scipy(sp.coo_matrix(np.asarray(a, dtype=np.float64)))


# --- golden fixtures (hand-computed) ---------------------------------------


def test_crs_degenerate_c1_sigma1():
    # C=1, sigma=1 => CRS: chunk_ptrs is the row pointer, no permutation
    a = [[1.0, 0, 2.0], [0, 0, 0], [3.0, 4.0, 5.0]]
    scs = convert_to_scs(dense_mtx(a), C=1, sigma=1)
    np.testing.assert_array_equal(scs.chunk_ptrs, [0, 2, 2, 5])
    np.testing.assert_array_equal(scs.chunk_lengths, [2, 0, 3])
    np.testing.assert_array_equal(scs.old_to_new_idx, [0, 1, 2])
    np.testing.assert_array_equal(scs.col_idxs, [0, 2, 0, 1, 2])
    np.testing.assert_array_equal(scs.values, [1, 2, 3, 4, 5])
    assert scs.n_elements == 5 and scs.nnz == 5
    assert scs.beta == 1.0


def test_ell_degenerate_c_eq_nrows():
    # C = n_rows, sigma = 1 => ELL: one chunk, padded to longest row,
    # column-major element layout
    a = [[1.0, 2.0], [3.0, 0.0]]
    scs = convert_to_scs(dense_mtx(a), C=2, sigma=1)
    assert scs.n_chunks == 1
    np.testing.assert_array_equal(scs.chunk_lengths, [2])
    np.testing.assert_array_equal(scs.chunk_ptrs, [0, 4])
    # layout: j=0: rows (0,1) -> values (1,3); j=1: rows (0,1) -> (2, pad 0)
    np.testing.assert_array_equal(scs.values, [1, 3, 2, 0])
    np.testing.assert_array_equal(scs.col_idxs, [0, 0, 1, 0])


def test_sigma_sort_window():
    # 4 rows with lengths [1, 3, 2, 1]; C=2, sigma=2:
    # window [0,2): sorted desc -> rows (1,0); window [2,4): rows (2,3)
    a = np.zeros((4, 4))
    a[0, 0] = 1.0
    a[1, :3] = [2.0, 3.0, 4.0]
    a[2, 1:3] = [5.0, 6.0]
    a[3, 3] = 7.0
    scs = convert_to_scs(dense_mtx(a), C=2, sigma=2)
    np.testing.assert_array_equal(scs.old_to_new_idx, [1, 0, 2, 3])
    np.testing.assert_array_equal(scs.chunk_lengths, [3, 2])
    np.testing.assert_array_equal(scs.chunk_ptrs, [0, 6, 10])
    # chunk 0: rows new0=old1 (2,3,4 @ cols 0,1,2), new1=old0 (1 @ col 0)
    np.testing.assert_array_equal(scs.values, [2, 1, 3, 0, 4, 0, 5, 7, 6, 0])
    np.testing.assert_array_equal(
        scs.col_idxs, [0, 0, 1, 0, 2, 0, 1, 3, 2, 0]
    )
    np.testing.assert_array_equal(scs.new_to_old_idx, [1, 0, 2, 3])


def test_padded_rows_and_inverse_perm():
    # n_rows=3, C=2 -> padded to 4; padded slot marked -1 in new_to_old
    a = [[1.0, 0, 0], [0, 2.0, 0], [0, 0, 3.0]]
    scs = convert_to_scs(dense_mtx(a), C=2, sigma=1)
    assert scs.n_rows_padded == 4
    assert scs.new_to_old_idx[3] == -1
    inv_defined = scs.new_to_old_idx[scs.new_to_old_idx >= 0]
    assert sorted(inv_defined.tolist()) == [0, 1, 2]


def test_empty_row_and_col_edge_cases():
    # top empty row, middle empty col (reference test_data/M1 variants)
    a = [[0, 0, 0], [1.0, 0, 2.0], [3.0, 0, 4.0]]
    for C, sigma in [(1, 1), (2, 1), (2, 2), (3, 3)]:
        scs = convert_to_scs(dense_mtx(a), C=C, sigma=sigma)
        np.testing.assert_allclose(scs.to_dense(), a)


def test_fixed_permutation_shared_across_submatrices():
    # adaptive precision: sub-matrix must reuse the primary permutation
    rng = np.random.default_rng(0)
    n = 16
    mat = sp.random(n, n, density=0.3, random_state=3, dtype=np.float64)
    mtx = MtxData.from_scipy(mat).sort_by_row()
    primary = convert_to_scs(mtx, C=4, sigma=8)
    sub = convert_to_scs(
        mtx, C=4, sigma=8, fixed_permutation=primary.old_to_new_idx
    )
    np.testing.assert_array_equal(sub.old_to_new_idx, primary.old_to_new_idx)
    np.testing.assert_allclose(sub.to_dense(), mat.toarray())


# --- sweep validation vs scipy (reference validate.sh campaign in miniature)


@pytest.mark.parametrize("name", ["impcol_e.mtx", "FDM-2d-16.mtx", "matrix1.mtx"])
@pytest.mark.parametrize("C,sigma", [(1, 1), (2, 2), (4, 1), (8, 16), (16, 512), (3, 10)])
def test_spmv_reference_matches_scipy(name, C, sigma):
    mtx = read_mtx(matrix_path(name))
    scs = convert_to_scs(mtx, C=C, sigma=sigma)
    x = np.arange(1, mtx.n_rows + 1, dtype=np.float64) / mtx.n_rows
    y_ref = mtx.to_scipy().tocsr() @ x

    # permuted SpMV: x permuted by old_to_new, cols remapped, y unpermuted
    x_pad = np.zeros(scs.n_rows_padded)
    x_pad[:, None][scs.old_to_new_idx, 0] = x
    full_perm = np.arange(scs.n_rows_padded, dtype=np.int32)
    full_perm[: scs.n_rows] = scs.old_to_new_idx
    permute_scs_cols(scs, full_perm)
    y_perm = scs.spmv_reference(x_pad)
    y = y_perm[scs.old_to_new_idx]
    np.testing.assert_allclose(y, y_ref, rtol=1e-13, atol=1e-13)


def test_reconstruction_all_formats(rng):
    n = 37
    mat = sp.random(n, n, density=0.15, random_state=11, dtype=np.float64)
    mtx = MtxData.from_scipy(mat).sort_by_row()
    for C, sigma in [(1, 1), (8, 1), (16, 32), (5, 7), (37, 1), (64, 64)]:
        scs = convert_to_scs(mtx, C=C, sigma=sigma)
        np.testing.assert_allclose(scs.to_dense(), mat.toarray())
        assert scs.nnz == mtx.nnz
        assert scs.n_elements == int(
            np.sum(scs.chunk_lengths.astype(np.int64) * C)
        )


def test_beta_and_footprint():
    a = [[1.0, 1.0], [1.0, 0.0]]
    scs = convert_to_scs(dense_mtx(a), C=2, sigma=1)
    assert scs.n_elements == 4 and scs.nnz == 3
    assert scs.beta == pytest.approx(0.75)
    assert scs.fill_in_percent == pytest.approx(100.0 / 3.0)
    assert scs.memory_footprint_bytes() > 0


def test_write_to_mtx_roundtrip(tmp_path):
    mtx = read_mtx(matrix_path("impcol_e.mtx"))
    scs = convert_to_scs(mtx, C=8, sigma=16)
    out = tmp_path / "dump.mtx"
    scs.write_to_mtx_file(str(out))
    back = read_mtx(str(out))
    assert abs(back.to_scipy() - mtx.to_scipy()).max() < 1e-12
