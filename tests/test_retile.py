"""Re-tiling engine tests (VERDICT r2 item 1).

The user's (C, sigma) — and CRS — is a LOGICAL format: it defines the row
permutation and the reported beta (reference kernels.hpp:216-301 parametrize
execution over C; scripts/check_perf.sh sweeps it), while execution re-packs
the permuted matrix into physical 1024-row lane-tile chunks. y must be
identical to the literal-layout execution after un-permutation.
"""

import numpy as np
import pytest

from uspmv_tpu.config import Config
from uspmv_tpu.formats.scs import (
    convert_to_scs,
    convert_to_scs_retiled,
    logical_elements,
    sigma_window_perm,
)
from uspmv_tpu.io.generators import generate_matrix
from uspmv_tpu.runtime.operator import SpmvOperator, use_lane_tiles


@pytest.fixture(scope="module")
def lap12():
    mtx = generate_matrix("Laplace3D,12")
    return mtx, mtx.to_scipy().astype(np.float64)


def _run(mtx, A, **kw):
    cfg = Config(value_type=kw.pop("value_type", "sp"), backend="cpu", **kw)
    op = SpmvOperator.from_mtx(cfg, mtx)
    y = op.to_host(op.spmv(op.make_x()))
    ref = A @ np.full(mtx.n_rows, 5.0)
    if y.ndim == 2:
        ref = np.repeat(ref[:, None], y.shape[1], 1)
    err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1.0)
    return op, err


@pytest.mark.parametrize(
    "C,sigma",
    [(1, 1), (16, 1), (16, 512), (64, 8), (256, 512), (4096, 4096)],
)
def test_retiled_scs_matches_scipy(lap12, C, sigma):
    mtx, A = lap12
    op, err = _run(mtx, A, kernel_format="scs", chunk_size=C, sigma=sigma)
    assert op.retiled
    assert op.impl_name() == "pallas-lane-tiles"
    assert err < 1e-5


def test_retiled_crs(lap12):
    mtx, A = lap12
    op, err = _run(mtx, A, kernel_format="crs")
    assert op.retiled and err < 1e-5
    # CRS never pads: logical beta is exactly 1
    assert op.beta() == {"sp": 1.0}


def test_retiled_matches_literal_layout(lap12):
    """Same y as -no_retile (literal XLA execution of the logical C)."""
    mtx, A = lap12
    op_r, _ = _run(mtx, A, kernel_format="scs", chunk_size=16, sigma=512)
    op_l, _ = _run(
        mtx, A, kernel_format="scs", chunk_size=16, sigma=512, retile=False
    )
    assert op_r.retiled and not op_l.retiled
    y_r = op_r.to_host(op_r.spmv(op_r.make_x()))
    y_l = op_l.to_host(op_l.spmv(op_l.make_x()))
    np.testing.assert_allclose(y_r, y_l, rtol=1e-6)


def test_logical_beta_matches_literal_conversion(lap12):
    """Reported beta equals the literal (C, sigma) conversion's beta."""
    mtx, _ = lap12
    for C, sigma in [(16, 1), (16, 512), (64, 8)]:
        literal = convert_to_scs(mtx.astype(np.float32), C, sigma)
        op, _err = _run(
            mtx, mtx.to_scipy().astype(np.float64),
            kernel_format="scs", chunk_size=C, sigma=sigma,
        )
        assert op.beta()["sp"] == pytest.approx(literal.beta, rel=1e-12)


def test_sigma_window_perm_matches_converter(lap12):
    """The standalone perm helper reproduces convert_to_scs's row order."""
    mtx, _ = lap12
    counts = np.bincount(mtx.I, minlength=mtx.n_rows)
    for C, sigma in [(16, 8), (8, 512)]:
        perm, lpad = sigma_window_perm(counts, mtx.n_rows, C, sigma)
        literal = convert_to_scs(mtx.astype(np.float32), C, sigma)
        np.testing.assert_array_equal(
            perm[: mtx.n_rows], literal.old_to_new_idx
        )
        assert logical_elements(counts, perm, C) == literal.n_elements


def test_convert_retiled_physical_layout(lap12):
    mtx, _ = lap12
    scs, lperm, lelems = convert_to_scs_retiled(
        mtx, 16, 512, dtype=np.float32
    )
    assert scs.C == 1024
    literal = convert_to_scs(mtx.astype(np.float32), 16, 512)
    assert lelems == literal.n_elements
    # same permuted y from both layouts
    x = np.arange(mtx.n_rows, dtype=np.float64) % 7 + 1.0
    xp = np.zeros(scs.n_rows_padded)
    xp[: mtx.n_rows] = x  # col_idxs still original here (no col perm)
    y_phys = scs.spmv_reference(xp)
    y_lit = literal.spmv_reference(xp)
    n = mtx.n_rows
    out_p = np.zeros(n)
    out_p[literal.new_to_old_idx[literal.new_to_old_idx >= 0]] = 0  # touch
    # un-permute both via their own maps and compare in original order
    vp = scs.new_to_old_idx >= 0
    a = np.zeros(n)
    a[scs.new_to_old_idx[vp]] = y_phys[vp]
    vl = literal.new_to_old_idx >= 0
    b = np.zeros(n)
    b[literal.new_to_old_idx[vl]] = y_lit[vl]
    np.testing.assert_allclose(a, b, rtol=1e-12)


def test_retiled_with_heavy_row_split():
    mtx = generate_matrix("BandedImbalanced,20000")
    A = mtx.to_scipy().astype(np.float64)
    op, err = _run(mtx, A, kernel_format="scs", chunk_size=16, sigma=64)
    assert op.retiled and err < 1e-5


def test_retiled_ap(lap12):
    mtx, A = lap12
    op, err = _run(
        mtx, A, kernel_format="scs", chunk_size=16, sigma=8,
        value_type="ap[sp_hp]", ap_threshold_1=0.5,
    )
    assert op.retiled and err < 3e-2  # bf16 value stream
    assert set(op.beta()) == {"sp", "hp"}


def test_use_lane_tiles_flag_logic():
    base = dict(value_type="sp", use_pallas=True, impl="auto")
    assert use_lane_tiles(
        Config(kernel_format="scs", chunk_size=16, sigma=512, **base)
    )
    assert use_lane_tiles(Config(kernel_format="crs", **base))
    assert not use_lane_tiles(
        Config(kernel_format="scs", chunk_size=16, sigma=512, retile=False,
               **base)
    )
    assert not use_lane_tiles(
        Config(kernel_format="crs", value_type="dp", use_pallas=True,
               impl="auto")
    )


def test_distributed_retiled():
    import jax

    if len(jax.devices("cpu")) < 4:
        pytest.skip("needs 4 virtual CPU devices")
    from uspmv_tpu.parallel.distributed import DistributedSpmvOperator

    mtx = generate_matrix("Laplace3D,16")
    A = mtx.to_scipy().astype(np.float64)
    cfg = Config(
        kernel_format="scs", chunk_size=16, sigma=8, value_type="sp",
        backend="cpu", n_shards=4, seg_method="seg-nnz",
    )
    op = DistributedSpmvOperator.from_mtx(cfg, mtx)
    assert op.retiled
    assert op.impl_name() == "pallas-lane-tiles"
    y = op.to_host(op.spmv(op.make_x()))
    ref = A @ np.full(mtx.n_rows, 5.0)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5
