"""Pallas lane-tile kernel tests (interpret mode on CPU validates the exact
device semantics; the real Mosaic path is exercised by bench.py on TPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from uspmv_tpu.config import Config
from uspmv_tpu.formats.scs import convert_to_scs, permute_scs_cols
from uspmv_tpu.io.generators import laplace2d, random_banded, random_imbalanced, tridiag
from uspmv_tpu.io.mmio import read_mtx
from uspmv_tpu.ops.gather_primitive import gather_lanes, gather_sublanes, gather_window
from uspmv_tpu.ops.packer import CHUNK_ROWS, pack_lane_tiles
from uspmv_tpu.ops.pallas_scs import build_device_lane_tiles, spmv_lane_tiles
from uspmv_tpu.runtime.operator import SpmvOperator, use_lane_tiles

from conftest import matrix_path


# ----------------------------------------------------------- gather primitive


def test_gather_sublanes_semantics(rng):
    src = rng.standard_normal((8, 128)).astype(np.float32)
    idx = rng.integers(0, 8, (8, 128)).astype(np.int32)
    out = np.asarray(gather_sublanes(jnp.asarray(src), jnp.asarray(idx)))
    want = np.take_along_axis(src, idx, axis=0)
    np.testing.assert_array_equal(out, want)


def test_gather_lanes_semantics(rng):
    src = rng.standard_normal((8, 128)).astype(np.float32)
    idx = rng.integers(0, 128, (8, 128)).astype(np.int32)
    out = np.asarray(gather_lanes(jnp.asarray(src), jnp.asarray(idx)))
    want = np.take_along_axis(src, idx, axis=1)
    np.testing.assert_array_equal(out, want)


def test_gather_window_composition(rng):
    """The two-step gather reproduces arbitrary window gathers when the
    packer's (row, source-lane) injectivity holds."""
    window = rng.standard_normal((8, 128)).astype(np.float32)
    # one element per (i, j): source offset with unique lane per (i, lane)
    lane = np.tile(np.arange(128, dtype=np.int32), (8, 1))
    sub = rng.integers(0, 8, (8, 128)).astype(np.int32)
    out = np.asarray(
        gather_window(jnp.asarray(window), jnp.asarray(sub), jnp.asarray(lane))
    )
    want = window[sub, lane]
    np.testing.assert_array_equal(out, want)


def test_gather_rejects_bad_shapes():
    with pytest.raises(ValueError, match="8,128"):
        gather_lanes(jnp.zeros((16, 128)), jnp.zeros((16, 128), jnp.int32))


# ------------------------------------------------------------------- packer


def small_scs(mtx, sigma=1):
    scs = convert_to_scs(mtx.astype(np.float32), CHUNK_ROWS, sigma)
    fp = np.arange(scs.n_rows_padded, dtype=np.int32)
    fp[: scs.n_rows] = scs.old_to_new_idx
    permute_scs_cols(scs, fp)
    return scs


def test_packer_conservation(rng):
    mtx = random_banded(600, 30, 9, seed=4)
    scs = small_scs(mtx)
    lt = pack_lane_tiles(scs)
    # every nonzero value lands in exactly one slot
    assert np.isclose(
        np.abs(lt.vals.astype(np.float64)).sum(),
        np.abs(mtx.values).sum(),
        rtol=1e-5,
    )
    assert lt.n_tiles % lt.tiles_per_step == 0
    assert np.all(np.diff(lt.tile_chunk) >= 0)
    # every group is covered (its output block gets zero-initialized) and
    # steps never straddle group boundaries
    tile_group = lt.tile_chunk // lt.chunks_per_group
    assert set(tile_group.tolist()) == set(range(lt.n_groups))
    per_step = tile_group.reshape(-1, lt.tiles_per_step)
    assert (per_step == per_step[:, :1]).all()


def test_packer_window_bounds(rng):
    mtx = random_imbalanced(900, 7, seed=5)
    scs = small_scs(mtx, sigma=CHUNK_ROWS)
    lt = pack_lane_tiles(scs)
    x_rows = max(scs.n_rows_padded // 128, 8)
    assert lt.w_row.min() >= 0
    assert lt.w_row.max() <= x_rows - 8


# --------------------------------------------------------------- kernel e2e


@pytest.mark.parametrize(
    "make",
    [
        lambda: laplace2d(40),
        lambda: tridiag(1500),
        lambda: random_banded(2500, 60, 11, seed=8),
        lambda: random_imbalanced(1200, 8, seed=9),
        lambda: read_mtx(matrix_path("bcsstk13.mtx")),
        lambda: read_mtx(matrix_path("impcol_e.mtx")),
    ],
)
@pytest.mark.parametrize("sigma", [1, CHUNK_ROWS])
def test_kernel_interpret_vs_scipy(make, sigma):
    mtx = make()
    scs = small_scs(mtx, sigma)
    dev = build_device_lane_tiles(scs)
    x = np.random.default_rng(0).standard_normal(mtx.n_rows).astype(np.float32)
    xp = np.zeros(scs.n_rows_padded, np.float32)
    xp[scs.old_to_new_idx] = x
    y = np.asarray(spmv_lane_tiles(dev, jnp.asarray(xp), interpret=True))
    y = y[scs.old_to_new_idx]
    ref = mtx.to_scipy().tocsr() @ x.astype(np.float64)
    scale = max(np.abs(ref).max(), 1e-30)
    assert np.abs(y - ref).max() / scale < 2e-5


@pytest.mark.parametrize("wr", [16, 32])
def test_kernel_wide_windows_interpret_vs_scipy(wr):
    # columns scattered over +-1800 (needs 32 x-rows of reach); forcing each
    # ladder width must stay exact — the multi-level select is pure routing
    from uspmv_tpu.io.generators import banded_imbalanced

    mtx = banded_imbalanced(4000, bandwidth=1800, avg_nnz_per_row=7, seed=3)
    scs = small_scs(mtx, 1)
    dev = build_device_lane_tiles(scs, window_rows=wr)
    assert dev.window_rows == wr
    x = np.random.default_rng(1).standard_normal(mtx.n_rows).astype(np.float32)
    xp = np.zeros(scs.n_rows_padded, np.float32)
    xp[scs.old_to_new_idx] = x
    y = np.asarray(spmv_lane_tiles(dev, jnp.asarray(xp), interpret=True))
    y = y[scs.old_to_new_idx]
    ref = mtx.to_scipy().tocsr() @ x.astype(np.float64)
    scale = max(np.abs(ref).max(), 1e-30)
    assert np.abs(y - ref).max() / scale < 2e-5


def test_window_ladder_improves_fill_on_scattered_band():
    # uniform row lengths + wide scatter: the window (not the slot
    # ceiling) binds, so each ladder step must recover spills
    from uspmv_tpu.io.generators import random_banded
    from uspmv_tpu.ops.packer import pack_lane_tiles

    mtx = random_banded(8000, 1800, 9, seed=3)
    scs = small_scs(mtx, 1)
    fills = {
        wr: pack_lane_tiles(scs, window_rows=wr, native=False).fill
        for wr in (8, 16, 32)
    }
    assert fills[32] > fills[16] > fills[8]


def test_align_split_rows_invariants():
    from uspmv_tpu.formats.coo import (
        FOLD_BLOCK, align_split_rows, split_heavy_rows,
    )
    from uspmv_tpu.io.generators import banded_imbalanced

    mtx = banded_imbalanced(5000, bandwidth=64, avg_nnz_per_row=8, seed=7)
    n_real = mtx.n_rows
    m2, parent = split_heavy_rows(mtx, 8)
    m3, e, s, region, virt_ids, parent2 = align_split_rows(m2, n_real, parent)
    assert region % FOLD_BLOCK == 0
    # reserved dead slot at every block start
    rel = virt_ids - n_real
    assert (rel % FOLD_BLOCK != 0).all()
    # runs stay within blocks: e and s of each parent share a block
    q = np.flatnonzero(e != s)
    assert (e[q] // FOLD_BLOCK == s[q] // FOLD_BLOCK).all()
    assert (s[q] >= 0).all()
    # semantics preserved: same y as the unaligned split after folding
    A_ref = mtx.to_scipy().tocsr()
    x = np.random.default_rng(0).standard_normal(mtx.n_rows)
    y3 = m3.to_scipy().tocsr() @ np.pad(x, (0, m3.n_rows - mtx.n_rows))[: m3.n_cols]
    folded = y3[:n_real].copy()
    np.add.at(folded, parent2, y3[virt_ids])
    np.testing.assert_allclose(folded, A_ref @ x, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("bs,layout", [(1, "rowwise"), (3, "rowwise"),
                                       (3, "colwise")])
def test_vectorized_fold_interpret_vs_scipy(bs, layout):
    # force aggressive splitting so the prefix-matmul + ±1-matrix fold
    # engages; must match scipy through spmv AND the solve-mode scan
    from uspmv_tpu.io.generators import banded_imbalanced

    mtx = banded_imbalanced(12_000, bandwidth=48, avg_nnz_per_row=7, seed=9)
    cfg = Config(
        kernel_format="scs", chunk_size=CHUNK_ROWS, sigma=1,
        value_type="sp", backend="cpu", split_rows_threshold=6,
        block_vec_size=bs, vector_layout=layout,
    )
    from uspmv_tpu.runtime.operator import SpmvOperator

    op = SpmvOperator.from_mtx(cfg, mtx)
    assert op.fold_dev is not None, "fold should engage at threshold 6"
    rng = np.random.default_rng(3)
    x = rng.standard_normal((mtx.n_rows, bs) if bs > 1 else mtx.n_rows)
    x = x.astype(np.float32)
    y = op.to_host(np.asarray(op.spmv(op.make_x(x))))
    ref = mtx.to_scipy().tocsr() @ x.astype(np.float64)
    scale = np.abs(ref).max()
    assert np.abs(y - ref).max() / scale < 2e-5
    _, y2 = op.solve(op.make_x(x), 2)
    y2 = op.to_host(np.asarray(y2))
    A = mtx.to_scipy().tocsr()
    ref2 = A @ (A @ x.astype(np.float64))
    assert np.abs(y2 - ref2).max() / np.abs(ref2).max() < 2e-4


# ------------------------------------------------- df64 (dp emulation)


def test_dp_emulation_interpret_and_structure():
    """Double-float dp on the lane-tile kernel. NOTE on tolerances: on
    REAL TPU hardware (Mosaic) this path measures ~1e-14 max rel error
    (Laplace3D-96, see BASELINE.md); the CPU interpret path used in tests
    degrades to ~1e-5 because the interpreter applies FP-unsafe
    simplifications (A-(A-B) -> B) that gut the error-free transforms.
    The test gates at 5e-5 to catch gross regressions; hardware accuracy
    is asserted by scripts/check_dp_emu.py on a chip."""
    from uspmv_tpu.io.generators import laplace2d
    from uspmv_tpu.runtime.operator import SpmvOperator

    rng = np.random.default_rng(0)
    mtx = laplace2d(64)
    mtx.values[:] = mtx.values * np.exp(rng.standard_normal(mtx.nnz) * 2)
    cfg = Config(kernel_format="scs", chunk_size=CHUNK_ROWS, sigma=1,
                 value_type="dp", dp_emulation=True, backend="cpu")
    op = SpmvOperator.from_mtx(cfg, mtx)
    assert op.impl_name() == "pallas-lane-tiles-df64"
    x = rng.standard_normal(mtx.n_rows)
    xd = op.make_x(x)
    assert xd.shape == (op.n_rows_padded, 2) and xd.dtype == jnp.float32
    y = op.to_host(np.asarray(op.spmv(xd)))
    assert y.dtype == np.float64
    ref = mtx.to_scipy().tocsr() @ x
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 5e-5, rel
    # (a "better than f32" margin is NOT asserted here: the interpret
    # path's degraded transforms leave only ~2x over f32; the real ~1e7x
    # advantage is asserted on hardware by scripts/check_dp_emu.py)
    # solve chains the pair through the scan swap
    _, y2 = op.solve(xd, 2)
    y2 = op.to_host(np.asarray(y2))
    A = mtx.to_scipy().tocsr()
    ref2 = A @ (A @ x)
    assert np.abs(y2 - ref2).max() / np.abs(ref2).max() < 5e-4


def test_dp_emulation_config_gates():
    with pytest.raises(ValueError, match="dp value stream"):
        Config(value_type="sp", dp_emulation=True).validate()
    with pytest.raises(ValueError, match="dp value stream"):
        Config(value_type="ap[sp_hp]", dp_emulation=True,
               ap_threshold_1=1.0).validate()
    # ap[dp_*] mixes ARE allowed (the dp partition runs the df64 kernel)
    Config(value_type="ap[dp_sp]", dp_emulation=True,
           ap_threshold_1=1.0).validate()
    # fully generalized (r4, VERDICT r3 item 4): rowwise block vectors,
    # sharding, and their combination all validate; colwise block
    # vectors remain the one exclusion (the df64 kernel fuses all RHS
    # columns in one stream)
    Config(value_type="dp", dp_emulation=True, block_vec_size=2,
           vector_layout="rowwise").validate()
    Config(value_type="dp", dp_emulation=True, n_shards=2).validate()
    Config(value_type="dp", dp_emulation=True, block_vec_size=2,
           vector_layout="rowwise", n_shards=2).validate()
    with pytest.raises(ValueError, match="rowwise"):
        Config(value_type="dp", dp_emulation=True,
               block_vec_size=2).validate()


def test_ap_df64_mixed_streams():
    """ap[dp_sp] under -dp_emu: the dp partition runs the double-float
    kernel ((hi, lo) pairs, error-free TwoProd/TwoSum — ap_kernels.hpp
    accumulates everything in double; our sp partials carry f32
    accumulation, a documented deviation) while sp reads the hi component.
    Exactness margins are asserted on-chip by scripts/check_dp_emu.py."""
    from uspmv_tpu.io.generators import laplace2d
    from uspmv_tpu.ops.pallas_scs import DeviceLaneTiles
    from uspmv_tpu.runtime.operator import SpmvOperator

    rng = np.random.default_rng(1)
    mtx = laplace2d(48)
    mtx.values[:] = mtx.values * np.exp(rng.standard_normal(mtx.nnz))
    th = float(np.median(np.abs(mtx.values)))
    cfg = Config(kernel_format="scs", chunk_size=CHUNK_ROWS, sigma=1,
                 value_type="ap[dp_sp]", ap_threshold_1=th,
                 dp_emulation=True, backend="cpu")
    op = SpmvOperator.from_mtx(cfg, mtx)
    assert op.impl_name() == "pallas-lane-tiles-df64"
    assert op.devs["dp"].df64 and not op.devs["sp"].df64
    npp = op.nnz_per_precision()
    assert npp["dp"] > 0 and npp["sp"] > 0
    assert npp["dp"] + npp["sp"] == mtx.nnz
    x = rng.standard_normal(mtx.n_rows)
    y = op.to_host(np.asarray(op.spmv(op.make_x(x))))
    ref = mtx.to_scipy().tocsr() @ x
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    # sp partition quantization dominates (~1e-7); interpret-path slack
    assert rel < 5e-5, rel


def test_operator_selects_lane_tiles():
    cfg = Config(
        kernel_format="scs", chunk_size=CHUNK_ROWS, sigma=1,
        value_type="sp", use_pallas=True, backend="cpu",
    )
    assert use_lane_tiles(cfg)
    mtx = laplace2d(32)
    op = SpmvOperator.from_mtx(cfg, mtx)
    from uspmv_tpu.ops.pallas_scs import DeviceLaneTiles

    assert isinstance(op.devs["sp"], DeviceLaneTiles)
    x = np.random.default_rng(1).standard_normal(mtx.n_rows)
    y = op.to_host(op.spmv(op.make_x(x)))
    ref = mtx.to_scipy().tocsr() @ x
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_operator_lane_tiles_block_vectors():
    cfg = Config(
        kernel_format="scs", chunk_size=CHUNK_ROWS, sigma=1,
        value_type="sp", use_pallas=True, backend="cpu",
        block_vec_size=3, vector_layout="rowwise",
    )
    mtx = laplace2d(24)
    op = SpmvOperator.from_mtx(cfg, mtx)
    x = np.random.default_rng(2).standard_normal((mtx.n_rows, 3))
    y = op.to_host(op.spmv(op.make_x(x)))
    ref = mtx.to_scipy().tocsr() @ x
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_operator_lane_tiles_hp_bf16():
    """hp streams bfloat16 values (paired (16,128) tiles); x/y and the
    accumulator stay f32, so accuracy is bf16-value-quantization only."""
    cfg = Config(
        kernel_format="scs", chunk_size=CHUNK_ROWS, sigma=1,
        value_type="hp", use_pallas=True, backend="cpu",
    )
    mtx = laplace2d(32)
    op = SpmvOperator.from_mtx(cfg, mtx)
    import ml_dtypes

    assert op.devs["hp"].vals.dtype == ml_dtypes.bfloat16
    assert op.devs["hp"].vals.shape[1] == 16  # paired tiles
    x = np.random.default_rng(3).standard_normal(mtx.n_rows)
    y = op.to_host(op.spmv(op.make_x(x))).astype(np.float64)
    ref = mtx.to_scipy().tocsr() @ x
    assert np.abs(y - ref).max() / np.abs(ref).max() < 2e-2


def test_operator_lane_tiles_ap_sp_hp():
    """ap[sp_hp]: two lane-tile structs sharing one permutation, summed."""
    cfg = Config(
        kernel_format="scs", chunk_size=CHUNK_ROWS, sigma=1,
        value_type="ap[sp_hp]", ap_threshold_1=2.0,
        use_pallas=True, backend="cpu",
    )
    mtx = random_banded(1500, 40, 7, seed=12)
    op = SpmvOperator.from_mtx(cfg, mtx)
    assert set(op.devs) == {"sp", "hp"}
    x = np.random.default_rng(4).standard_normal(mtx.n_rows)
    y = op.to_host(op.spmv(op.make_x(x))).astype(np.float64)
    ref = mtx.to_scipy().tocsr() @ x
    # |a| >= 2 in f32, small values in bf16
    assert np.abs(y - ref).max() / np.abs(ref).max() < 2e-2


def test_dp_falls_back_to_xla():
    cfg = Config(
        kernel_format="scs", chunk_size=CHUNK_ROWS, sigma=1,
        value_type="dp", use_pallas=True, backend="cpu",
    )
    assert not use_lane_tiles(cfg)


def test_windowed_x_kernel():
    """Matrices whose x exceeds the VMEM budget stream per-group x windows
    from HBM (double-buffered DMA). Forced small here; validated in
    interpret mode (and on real hardware at 4.1M rows by the perf sweep)."""
    from uspmv_tpu.ops.pallas_scs import build_device_lane_tiles, spmv_lane_tiles

    mtx = laplace2d(64)
    scs = small_scs(mtx)
    for bs in (1, 3):
        dev = build_device_lane_tiles(
            scs, x_window=True, block_vec_size=bs, chunks_per_group=2
        )
        assert dev.x_block_rows > 0 and dev.n_groups == 2
        x = np.random.default_rng(0).standard_normal(
            (mtx.n_rows, bs) if bs > 1 else mtx.n_rows
        ).astype(np.float32)
        xp = np.zeros((scs.n_rows_padded,) + x.shape[1:], np.float32)
        xp[scs.old_to_new_idx] = x
        y = np.asarray(spmv_lane_tiles(dev, jnp.asarray(xp), interpret=True))
        y = y[scs.old_to_new_idx]
        ref = mtx.to_scipy().tocsr() @ x.astype(np.float64)
        assert np.abs(y - ref).max() / np.abs(ref).max() < 2e-5


def test_dp_emulation_block_vectors_rowwise():
    """-dp_emu with bs=4 rowwise (VERDICT r2 item 5): all RHS columns
    share one df64 value stream (reference block dp kernels,
    kernels.hpp:68-154)."""
    from uspmv_tpu.io.generators import laplace2d
    from uspmv_tpu.runtime.operator import SpmvOperator

    rng = np.random.default_rng(0)
    mtx = laplace2d(48)
    mtx.values[:] = mtx.values * np.exp(rng.standard_normal(mtx.nnz))
    cfg = Config(kernel_format="scs", chunk_size=CHUNK_ROWS, sigma=1,
                 value_type="dp", dp_emulation=True, block_vec_size=4,
                 vector_layout="rowwise", backend="cpu")
    op = SpmvOperator.from_mtx(cfg, mtx)
    assert op.impl_name() == "pallas-lane-tiles-df64"
    x = rng.standard_normal(mtx.n_rows)
    xb = np.stack([x * (k + 1) for k in range(4)], axis=1)
    y = op.to_host(np.asarray(op.spmv(op.make_x(xb))))
    A = mtx.to_scipy().tocsr()
    ref = np.stack([A @ (x * (k + 1)) for k in range(4)], axis=1)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 5e-5
    # colwise + dp_emu stays a clean config error
    with pytest.raises(ValueError, match="rowwise"):
        Config(value_type="dp", dp_emulation=True, block_vec_size=2,
               vector_layout="colwise").validate()


def test_windowed_x_df64_kernel():
    """dp emulation with x beyond the VMEM budget: the (hi, lo) planes
    stream per-group HBM->VMEM windows (round-2 refused this case)."""
    from uspmv_tpu.io.generators import laplace2d
    from uspmv_tpu.ops.pallas_scs import (
        build_device_lane_tiles, spmv_lane_tiles,
    )

    rng = np.random.default_rng(0)
    mtx = laplace2d(64)
    mtx.values[:] = mtx.values * np.exp(rng.standard_normal(mtx.nnz))
    scs = small_scs(mtx)
    dev = build_device_lane_tiles(
        scs, dtype=np.float64, x_window=True, chunks_per_group=2
    )
    assert dev.df64 and dev.x_block_rows > 0 and dev.n_groups == 2
    x = rng.standard_normal(mtx.n_rows)
    xp = np.zeros(scs.n_rows_padded)
    xp[scs.old_to_new_idx] = x
    hi = xp.astype(np.float32)
    lo = (xp - hi.astype(np.float64)).astype(np.float32)
    pair = jnp.asarray(np.stack([hi, lo], axis=-1))
    y = np.asarray(spmv_lane_tiles(dev, pair, interpret=True))
    y = (y[..., 0].astype(np.float64) + y[..., 1].astype(np.float64))
    y = y[scs.old_to_new_idx]
    ref = mtx.to_scipy().tocsr() @ x
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 5e-5, rel  # interpret guts EFTs; on-chip check is 1e-14


# ------------------------------------------------------------- fused solve


def test_solve_lane_tiles_matches_iterated_spmv(rng):
    """k iterations in ONE launch == k separate launches, bit-for-bit
    (same gathers, same accumulation order, f32 throughout)."""
    from uspmv_tpu.ops.pallas_scs import solve_lane_tiles, solve_tiles_fit

    mtx = random_banded(1500, 40, 7, seed=11)
    # scale down so A^k x stays in f32 range
    mtx.values[:] = mtx.values * (0.05 / np.abs(mtx.values).max())
    scs = small_scs(mtx)
    dev = build_device_lane_tiles(scs)
    assert solve_tiles_fit(dev, 1)
    x0 = rng.standard_normal(scs.n_rows_padded).astype(np.float32)
    xp = jnp.asarray(x0)
    for k in (1, 2, 5):
        y_prev, y_fin = solve_lane_tiles(dev, xp, k, interpret=True)
        ref = xp
        for _ in range(k):
            prev = ref
            ref = spmv_lane_tiles(dev, ref, interpret=True)
        np.testing.assert_array_equal(np.asarray(y_fin), np.asarray(ref))
        want_prev = np.asarray(prev) if k > 1 else x0
        np.testing.assert_array_equal(np.asarray(y_prev), want_prev)


def test_solve_lane_tiles_block_vectors(rng):
    from uspmv_tpu.ops.pallas_scs import solve_lane_tiles

    mtx = laplace2d(40)
    mtx.values[:] = mtx.values * 0.1
    scs = small_scs(mtx)
    dev = build_device_lane_tiles(scs, block_vec_size=3)
    xb = jnp.asarray(
        rng.standard_normal((scs.n_rows_padded, 3)).astype(np.float32)
    )
    _, y = solve_lane_tiles(dev, xb, 3, interpret=True)
    ref = xb
    for _ in range(3):
        ref = spmv_lane_tiles(dev, ref, interpret=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_operator_solve_uses_fused_kernel_and_validates(rng, monkeypatch):
    """End-to-end: with the opt-in set (the fused kernel measured SLOWER
    than scan-of-launches per chained iteration — 10.5 vs 5.1 us on
    bcsstk13, scripts/solve_diag.py round 5 — so scan is the default),
    the operator's solve picks the fused path on an eligible matrix and
    the result matches the f64 oracle at solve-mode tolerances
    (reference main.cpp:528-607 + MKL compare)."""
    from uspmv_tpu.runtime.validate import validate_solve

    monkeypatch.setenv("USPMV_FUSED_SOLVE", "1")
    mtx = laplace2d(40)  # spectral radius < 8 scaled below
    mtx.values[:] = mtx.values * 0.1
    cfg = Config(kernel_format="scs", chunk_size=CHUNK_ROWS, sigma=1,
                 value_type="sp", backend="cpu")
    op = SpmvOperator.from_mtx(cfg, mtx)
    assert op._fused_solve_eligible()
    x0 = rng.standard_normal(mtx.n_rows)
    xd = op.make_x(x0)
    _, y = op.solve(xd, 4)
    rep = validate_solve(
        mtx, op.to_host(np.asarray(op.make_x(x0))), 
        np.asarray(op.to_host(y), dtype=np.float64), 4, value_type="sp",
    )
    assert rep.ok, rep


def test_fused_solve_ineligible_paths_fall_back():
    """AP (two streams) and windowed-x must keep the scan path."""
    mtx = laplace2d(40)
    cfg = Config(kernel_format="scs", chunk_size=CHUNK_ROWS, sigma=1,
                 value_type="ap[sp_hp]", ap_threshold_1=1.0, backend="cpu")
    op = SpmvOperator.from_mtx(cfg, mtx)
    if len(op.devs) == 2:
        assert not op._fused_solve_eligible()
    # windowed-x: force via a device built with x_window=True
    from uspmv_tpu.ops.pallas_scs import solve_tiles_fit

    scs = small_scs(mtx)
    dev_w = build_device_lane_tiles(scs, x_window=True)
    assert dev_w.x_block_rows > 0
    assert not solve_tiles_fit(dev_w, 1)


@pytest.mark.parametrize("bs", [16, 32])
def test_spmmv_wide_block_vectors(bs):
    """bs in {16, 32} rowwise (VERDICT r3 item 7; reference supports
    arbitrary block_vec_size, kernels.hpp:306-551): builds must engage
    either whole-x or windowed-x mode cleanly — a budget overflow raises
    a typed error upstream, never a cliff — and match scipy."""
    from uspmv_tpu.io.generators import laplace3d
    from uspmv_tpu.runtime.operator import SpmvOperator

    mtx = laplace3d(24)
    cfg = Config(
        kernel_format="scs", chunk_size=CHUNK_ROWS, sigma=1,
        value_type="sp", backend="cpu",
        block_vec_size=bs, vector_layout="rowwise",
    )
    op = SpmvOperator.from_mtx(cfg, mtx)
    assert op.impl_name().startswith("pallas-lane-tiles")
    rng = np.random.default_rng(bs)
    X = rng.standard_normal((mtx.n_rows, bs)).astype(np.float32)
    Y = op.to_host(np.asarray(op.spmv(op.make_x(X))))
    ref = mtx.to_scipy().tocsr() @ X.astype(np.float64)
    assert np.abs(Y - ref).max() / np.abs(ref).max() < 2e-5


def test_rhs_column_grouping_when_block_vector_blows_budget(monkeypatch):
    """Rowwise SpMMV whose block vector exceeds the VMEM budget must run
    in RHS column groups on the lane-tile kernel instead of falling to
    the XLA path (measured round 5: bs=32 on Laplace3D-96 fell to 5.2
    GFLOP/s XLA where two bs=16 passes run ~197 each; perf_sweep.jsonl).
    Reference contract: arbitrary block_vec_size, kernels.hpp:306-551."""
    import warnings

    from uspmv_tpu.io.generators import laplace2d
    from uspmv_tpu.ops.pallas_scs import (
        LaneTileBudgetError,
        build_device_lane_tiles,
    )

    m = laplace2d(64)
    cfg = Config(kernel_format="scs", chunk_size=CHUNK_ROWS, sigma=1,
                 value_type="sp", backend="cpu", block_vec_size=8,
                 vector_layout="rowwise")

    # deterministic budget refusal: any build wider than 4 RHS columns
    def narrow_build(scs, **kw):
        if kw.get("block_vec_size", 1) > 4:
            raise LaneTileBudgetError("injected: bs window over budget")
        return build_device_lane_tiles(scs, **kw)

    import uspmv_tpu.ops.pallas_scs as ps

    monkeypatch.setattr(ps, "build_device_lane_tiles", narrow_build)
    with warnings.catch_warnings(record=True) as ws:
        warnings.simplefilter("always")
        op = SpmvOperator.from_mtx(cfg, m)
    assert op.impl_name() == "pallas-lane-tiles"
    assert op.rhs_group == 4
    assert any("groups" in str(w.message) for w in ws)
    X = np.random.default_rng(0).standard_normal((m.n_rows, 8))
    y = op.to_host(op.spmv(op.make_x(X)))
    ref = m.to_scipy().astype(np.float64) @ X
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5
