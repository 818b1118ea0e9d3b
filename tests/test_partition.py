"""Adaptive-precision partitioner tests (reference utilities.hpp:2810-3123)."""

import numpy as np
import pytest
import scipy.sparse as sp

from uspmv_tpu.formats.coo import MtxData, equilibrate_matrix
from uspmv_tpu.io.mmio import read_mtx
from uspmv_tpu.precision.partition import (
    ap_threshold_from_norm,
    partition_precisions,
)

from conftest import matrix_path


def small_mtx():
    vals = np.array([1e-8, 0.5, 2.0, 1e-3, 7.0, 3e-5], dtype=np.float64)
    I = np.array([0, 0, 1, 2, 2, 3])
    J = np.array([0, 1, 1, 2, 0, 3])
    return MtxData.from_arrays(I, J, vals, n_rows=4, n_cols=4)


def test_two_way_dp_sp_bucketing():
    subs, dropped = partition_precisions(small_mtx(), "ap[dp_sp]", 0.1)
    assert dropped == 0
    assert subs["dp"].nnz == 3  # 0.5, 2.0, 7.0
    assert subs["sp"].nnz == 3
    assert subs["dp"].values.dtype == np.float64
    assert subs["sp"].values.dtype == np.float32
    # boundary: |a| >= th goes high
    subs2, _ = partition_precisions(small_mtx(), "ap[dp_sp]", 0.5)
    assert subs2["dp"].nnz == 3  # 0.5 itself is >= 0.5


def test_two_way_dp_hp_and_sp_hp():
    import ml_dtypes

    subs, _ = partition_precisions(small_mtx(), "ap[dp_hp]", 0.1)
    assert subs["hp"].values.dtype == np.dtype(ml_dtypes.bfloat16)
    subs, _ = partition_precisions(small_mtx(), "ap[sp_hp]", 0.1)
    assert subs["sp"].values.dtype == np.float32
    assert set(subs) == {"sp", "hp"}


def test_three_way():
    subs, _ = partition_precisions(small_mtx(), "ap[dp_sp_hp]", 0.1, 1e-4)
    assert subs["dp"].nnz == 3
    assert subs["sp"].nnz == 1  # 1e-3
    assert subs["hp"].nnz == 2  # 1e-8, 3e-5
    total = sum(s.nnz for s in subs.values())
    assert total == 6


def test_three_way_threshold_ordering():
    with pytest.raises(ValueError):
        partition_precisions(small_mtx(), "ap[dp_sp_hp]", 0.1, 0.2)


def test_dropout_applied_and_counted():
    # reference parses but never applies dropout; we implement it
    subs, dropped = partition_precisions(
        small_mtx(), "ap[dp_sp]", 0.1, dropout=True, dropout_threshold=1e-4
    )
    assert dropped == 2  # 1e-8 and 3e-5
    assert sum(s.nnz for s in subs.values()) == 4


def test_equilibrated_threshold():
    mtx = small_mtx()
    lr, lc = equilibrate_matrix(mtx)
    subs, _ = partition_precisions(
        mtx,
        "ap[dp_sp]",
        0.25,
        equilibrate=True,
        largest_row_elems=lr,
        largest_col_elems=lc,
    )
    # per-element threshold = th / (maxcol_j * maxrow_i); conservation holds
    assert sum(s.nnz for s in subs.values()) == 6
    # recombined matrix equals the scaled original
    recomb = sum(s.to_scipy().toarray() for s in subs.values())
    np.testing.assert_allclose(
        recomb, mtx.to_scipy().toarray(), rtol=1e-6, atol=1e-9
    )


def test_conservation_on_real_matrix():
    mtx = read_mtx(matrix_path("bcsstk13.mtx"))
    th = ap_threshold_from_norm(mtx, 1e-14)
    assert th > 0
    subs, dropped = partition_precisions(mtx, "ap[dp_sp]", th)
    assert subs["dp"].nnz + subs["sp"].nnz == mtx.nnz
    assert subs["dp"].nnz > 0 and subs["sp"].nnz > 0
    # recombination is exact in dp, within sp rounding for the sp bucket
    recomb = (
        subs["dp"].to_scipy().toarray()
        + subs["sp"].astype(np.float64).to_scipy().toarray()
    )
    np.testing.assert_allclose(
        recomb, mtx.to_scipy().toarray(), rtol=1e-6, atol=1e-30
    )


def test_rejects_non_ap():
    with pytest.raises(ValueError):
        partition_precisions(small_mtx(), "dp", 0.1)
