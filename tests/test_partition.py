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


def test_wide_spectrum_three_way_split():
    """WideSpectrum (io/generators.py) is the matrix class the 3-way
    ap[dp_sp_hp] mode exists for (reference utilities.hpp:3042-3121,
    VERDICT r3 item 6): at bench tolerances (tol1=1e-10, tol2=1e-13 —
    matched to the on-chip f32 accumulation noise floor ~1e-7) the hp
    bucket takes a third of the nnz at a value error that stays below
    that floor, so the 2-byte stream is a pure bandwidth win."""
    from uspmv_tpu.io.generators import wide_spectrum

    mtx = wide_spectrum(12)
    a = np.abs(mtx.values)
    assert a.max() / a.min() >= 1e6  # >= 6 decades by construction

    inf_norm = float(np.abs(mtx.to_scipy()).sum(axis=1).max())
    th1 = 1e-10 * inf_norm / (0.5 * 2.0 ** -23)
    th2 = 1e-13 * inf_norm / (0.5 * 2.0 ** -23)
    subs, dropped = partition_precisions(mtx, "ap[dp_sp_hp]", th1, th2)
    assert dropped == 0
    assert sum(s.nnz for s in subs.values()) == mtx.nnz
    # each bucket is substantial: this is NOT a degenerate split
    for p in ("dp", "sp", "hp"):
        assert subs[p].nnz / mtx.nnz > 0.15, (p, subs[p].nnz / mtx.nnz)

    # simulated value error of the 3-way representation vs f64 must stay
    # below the on-chip accumulation floor (so hp costs nothing visible)
    import jax.numpy as jnp

    x = np.random.default_rng(0).standard_normal(mtx.n_rows)
    A = sp.coo_matrix(
        (mtx.values, (mtx.I, mtx.J)), shape=(mtx.n_rows, mtx.n_cols)
    ).tocsr()
    y_ref = A @ x
    recomb = (
        subs["dp"].to_scipy().toarray()
        + subs["sp"].astype(np.float32).astype(np.float64).to_scipy().toarray()
        + np.asarray(
            jnp.asarray(subs["hp"].to_scipy().toarray(), dtype=jnp.bfloat16),
            dtype=np.float64,
        )
    )
    y3 = recomb @ x
    rel = np.abs(y3 - y_ref).max() / np.abs(y_ref).max()
    assert rel < 1e-7, rel
