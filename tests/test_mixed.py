"""Mixed-chunk tiles — the zero-column-locality mode (VERDICT r2 item 3).

Chunk-local lane-tile packing caps fill at chunk_nnz*window/col_span;
random/power-law columns land at ~0.02 and blow the SMEM tile budget into
the 0.2 GFLOP/s XLA fallback. Mixed tiles pool elements from up to
M_MIXED chunks of one output group (banded selectors: chunk-local id =
band*m + sel, sel in src16 bits 12-14) at the cost of m masked
read-modify-writes per tile.
"""

import numpy as np
import pytest

from uspmv_tpu.config import Config
from uspmv_tpu.formats.coo import split_heavy_rows
from uspmv_tpu.formats.scs import convert_to_scs
from uspmv_tpu.io.generators import generate_matrix, random_imbalanced
from uspmv_tpu.ops.packer import (
    LANES,
    MIXED_SEL_SHIFT,
    TILE_J,
    pack_mixed_tiles,
)


@pytest.fixture(scope="module")
def rand_scs():
    mtx = random_imbalanced(12_000, 8, seed=3)
    m2, _ = split_heavy_rows(mtx, 32)
    return convert_to_scs(m2.astype(np.float32), 1024, 1)


def _host_decode(mt, scs, x):
    """Reconstruct y from the packed tiles exactly as the kernel would."""
    wr = mt.window_rows
    x_rows = (scs.n_rows_padded + LANES - 1) // LANES
    xp = np.zeros(max(x_rows, wr + int(mt.w_row.max())) * LANES)
    xp[: scs.n_rows_padded] = x
    x2d = xp.reshape(-1, LANES)
    G = mt.chunks_per_group
    y = np.zeros(mt.n_groups * G * 1024)
    for t in range(mt.n_tiles):
        w = int(mt.w_row[t])
        g = int(mt.tile_group[t])
        window = x2d[w : w + wr]
        src = mt.src_tab[t]
        lane = src & 127
        sub = (src >> 7) & 63  # lane-addressed table
        sel = (src >> MIXED_SEL_SHIFT) & 7
        vals = mt.vals[t].astype(np.float64)
        for i in range(TILE_J):
            for j in np.nonzero(vals[i])[0]:
                l = lane[i, j]
                cl = mt.cls[t, sel[i, j]]
                row = (g * G + cl) * 1024 + i * 128 + j
                y[row] += vals[i, j] * window[sub[i, l], l]
    return y


def test_pack_decode_exact(rand_scs):
    scs = rand_scs
    mt = pack_mixed_tiles(scs, window_rows=32, native=False)
    assert mt.fill > 0.05  # far above the regular packer's ~0.02 here
    x = np.random.default_rng(0).standard_normal(scs.n_rows_padded)
    y = _host_decode(mt, scs, x)
    ref = scs.spmv_reference(x)
    err = np.abs(y[: scs.n_rows_padded] - ref).max() / np.abs(ref).max()
    assert err < 1e-12


def test_native_packer_bit_identical(rand_scs):
    from uspmv_tpu.native import pack_mixed_tiles_native

    scs = rand_scs
    b = pack_mixed_tiles_native(scs, np.float32, window_rows=32)
    if b is None:
        pytest.skip("native host library unavailable")
    a = pack_mixed_tiles(scs, window_rows=32, native=False)
    for f in ("vals", "src_tab", "w_row", "tile_group", "cls"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f))


def test_kernel_interpret_matches_reference(rand_scs):
    from uspmv_tpu.ops.pallas_scs import (
        build_device_mixed_tiles,
        spmv_mixed_tiles,
    )

    scs = rand_scs
    dev = build_device_mixed_tiles(scs, window_rows=32)
    x = np.random.default_rng(0).standard_normal(
        scs.n_rows_padded
    ).astype(np.float32)
    y = np.asarray(spmv_mixed_tiles(dev, x, interpret=True))
    ref = scs.spmv_reference(x)
    err = np.abs(y - ref[: scs.n_rows_padded]).max() / np.abs(ref).max()
    assert err < 1e-5


def test_window_fill_estimator():
    """The estimator flags large random-column matrices (where window
    density is hopeless) and keeps structured or SMALL matrices on the
    regular packer — a 30k-row random matrix still has ~1k elements per
    window and packs fine."""
    from uspmv_tpu.formats.coo import MtxData
    from uspmv_tpu.runtime.operator import (
        MIXED_EST_CUTOFF,
        _window_fill_estimate,
    )

    rng = np.random.default_rng(0)
    n = 500_000
    rows = np.repeat(np.arange(64 * 1024, dtype=np.int64), 8)
    cols = rng.integers(0, n, rows.size)
    big_rand = MtxData.from_arrays(
        rows, cols, np.ones(rows.size), n_rows=n, n_cols=n
    ).sort_by_row()
    assert _window_fill_estimate(big_rand) < MIXED_EST_CUTOFF
    assert (
        _window_fill_estimate(random_imbalanced(30_000, 8, seed=1))
        > MIXED_EST_CUTOFF
    )
    assert (
        _window_fill_estimate(generate_matrix("Laplace3D,12"))
        > MIXED_EST_CUTOFF
    )


def test_operator_forced_mixed_matches_scipy():
    """bs=2 rowwise keeps the 3-pass mode out (it is bs=1 only), so this
    exercises the masked mixed-tile operator end to end."""
    from uspmv_tpu.runtime.operator import SpmvOperator

    rand = random_imbalanced(30_000, 8, seed=1)
    cfg = Config(kernel_format="scs", chunk_size=1024, sigma=1,
                 value_type="sp", backend="cpu", mixed_tiles=True,
                 block_vec_size=2, vector_layout="rowwise")
    op = SpmvOperator.from_mtx(cfg, rand)
    assert op.impl_name() == "pallas-mixed-tiles"
    A = rand.to_scipy().astype(np.float64)
    x = np.random.default_rng(2).standard_normal(rand.n_rows)
    xb = np.stack([x, 2 * x], axis=1)
    y = op.to_host(np.asarray(op.spmv(op.make_x(xb))))
    ref = np.stack([A @ x, A @ (2 * x)], axis=1)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_operator_forced_regular():
    rand = random_imbalanced(30_000, 8, seed=1)
    from uspmv_tpu.runtime.operator import SpmvOperator

    cfg = Config(kernel_format="scs", chunk_size=1024, sigma=1,
                 value_type="sp", backend="cpu", mixed_tiles=False)
    op = SpmvOperator.from_mtx(cfg, rand)
    assert op.impl_name() != "pallas-mixed-tiles"


def test_powerlaw_cols_generator():
    mtx = generate_matrix("PowerLawCols,5000,6")
    assert mtx.n_rows == 5000
    counts = np.bincount(mtx.J, minlength=5000)
    # hub columns: the most popular column appears in far more rows than
    # the median column
    assert counts.max() > 50 * max(np.median(counts), 1)


# ------------------------- transpose-stream (3-pass) mode ----------------


def test_product_tiles_native_parity(rand_scs):
    from uspmv_tpu.native import pack_product_tiles_native
    from uspmv_tpu.ops.packer import pack_product_tiles

    b = pack_product_tiles_native(rand_scs, np.float32)
    if b is None:
        pytest.skip("native host library unavailable")
    a = pack_product_tiles(rand_scs, native=False)
    for f in ("vals", "src_tab", "w_row", "elem_rows", "elem_pos",
              "spill_rows", "spill_cols", "spill_vals"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f))
    assert (a.NB, a.NCg, a.s_pad, a.nnz_packed) == (
        b.NB, b.NCg, b.s_pad, b.nnz_packed
    )


def test_tstream_host_decode_exact(rand_scs):
    """Phase-1 pack + transpose geometry + B' element map reconstruct y
    exactly on the host (no kernels involved)."""
    from uspmv_tpu.ops.packer import (
        LANES,
        PRODUCT_WINDOW_ROWS,
        TILE_J,
        pack_product_tiles,
    )

    scs = rand_scs
    pt = pack_product_tiles(scs)
    x = np.random.default_rng(0).standard_normal(scs.n_rows_padded)
    wr = PRODUCT_WINDOW_ROWS
    x_rows = max((scs.n_rows_padded + 127) // 128,
                 wr + int(pt.w_row.max()))
    xp = np.zeros(x_rows * LANES)
    xp[: scs.n_rows_padded] = x
    x2d = xp.reshape(-1, LANES)
    s8 = pt.s_pad // 8
    p = np.zeros((pt.n_tiles, TILE_J, LANES))
    for t in range(pt.n_tiles):
        w = int(pt.w_row[t])
        win = x2d[w : w + wr]
        src = pt.src_tab[t]
        lane = src & 127
        sub = (src >> 7) & 63
        g = win[sub[np.arange(TILE_J)[:, None], lane], lane]
        p[t] = pt.vals[t].astype(np.float64) * g
    P = p.reshape(pt.NB, pt.NCg, s8, TILE_J, LANES)
    PT = np.transpose(P, (1, 4, 0, 2, 3)).reshape(
        pt.NCg * 128, pt.NB * pt.s_pad
    )[: pt.n_chunks].reshape(-1)
    y = np.zeros(scs.n_rows_padded)
    np.add.at(y, pt.elem_rows, PT[pt.elem_pos])
    if pt.spill_rows.size:
        np.add.at(y, pt.spill_rows, pt.spill_vals * xp[pt.spill_cols])
    ref = scs.spmv_reference(x)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-12


def test_tstream_device_interpret(rand_scs):
    from uspmv_tpu.runtime.tstream import build_tstream, spmv_tstream

    scs = rand_scs
    dev = build_tstream(scs)
    x = np.random.default_rng(0).standard_normal(
        scs.n_rows_padded
    ).astype(np.float32)
    y = np.asarray(spmv_tstream(dev, x, interpret=True))
    ref = scs.spmv_reference(x)
    err = np.abs(y - ref[: scs.n_rows_padded]).max() / np.abs(ref).max()
    assert err < 1e-5


def test_operator_tstream_auto(rand_scs):
    """With mixed_tiles forced on and bs=1, the operator prefers the
    3-pass mode and still matches scipy end to end."""
    from uspmv_tpu.runtime.operator import SpmvOperator

    rand = random_imbalanced(30_000, 8, seed=1)
    cfg = Config(kernel_format="scs", chunk_size=1024, sigma=1,
                 value_type="sp", backend="cpu", mixed_tiles=True)
    op = SpmvOperator.from_mtx(cfg, rand)
    assert op.impl_name() == "pallas-tstream"
    A = rand.to_scipy().astype(np.float64)
    x = np.random.default_rng(2).standard_normal(rand.n_rows)
    y = op.to_host(op.spmv(op.make_x(x)))
    ref = A @ x
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_colwalk_native_parity(rand_scs):
    from uspmv_tpu.native import pack_colwalk_native
    from uspmv_tpu.ops.packer import pack_lane_tiles_colwalk

    b = pack_colwalk_native(rand_scs, np.float32, window_rows=32)
    if b is None:
        pytest.skip("native host library unavailable")
    a = pack_lane_tiles_colwalk(rand_scs, window_rows=32, native=False)
    for f in ("vals", "src_tab", "w_row", "tile_chunk"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f))


def test_tstream_cell_cap_spill_xla_term():
    """Cell-capacity capping (round 4): one overfull (column-block x
    chunk) cell must not set the global phase-1 capacity — the cap comes
    from the actual cell-size distribution, and the overflow (an
    output-sparse handful) runs as the direct XLA gather/scatter-add
    term (spill_coo), not a chunked spill kernel. End-to-end exact."""
    from uspmv_tpu.ops.packer import PRODUCT_WINDOW_ROWS
    from uspmv_tpu.runtime.tstream import (
        SPILL_XLA_MAX,
        build_tstream,
        spmv_tstream,
    )

    rng = np.random.default_rng(11)
    n = 20_480
    # uniform-random background (small Poisson cells) ...
    rows = rng.integers(0, n, size=8 * n)
    cols = rng.integers(0, n, size=8 * n)
    # ... plus one hot cell: ~400 elements in chunk 0 x column-block 0,
    # spread over distinct columns so no single column is a hub
    W = PRODUCT_WINDOW_ROWS * LANES
    hot_r = rng.integers(0, 1024, size=400)
    hot_c = rng.permutation(min(W, n))[:400]
    rows = np.concatenate([rows, hot_r])
    cols = np.concatenate([cols, hot_c])
    vals = rng.standard_normal(rows.size)
    order = np.argsort(rows, kind="stable")
    from uspmv_tpu.formats.coo import MtxData

    m = MtxData.from_arrays(
        rows[order], cols[order], vals[order], n_rows=n, n_cols=n,
        is_sorted=True,
    )
    m2, _ = split_heavy_rows(m, 32)
    scs = convert_to_scs(m2.astype(np.float32), 1024, 1)
    dev = build_tstream(scs)
    assert dev.spill_coo is not None, "hot cell must overflow into the XLA term"
    assert dev.spill is None
    assert int(dev.spill_coo[0].shape[0]) <= SPILL_XLA_MAX
    # accounting covers every element across packed + spilled
    assert dev.nnz == scs.nnz
    x = rng.standard_normal(scs.n_rows_padded).astype(np.float32)
    y = np.asarray(spmv_tstream(dev, x, interpret=True))
    ref = scs.spmv_reference(x)
    err = np.abs(y - ref[: scs.n_rows_padded]).max() / np.abs(ref).max()
    assert err < 1e-5, err


def test_hub_peel_powerlaw_tstream():
    """Hub-column peeling (VERDICT r3 item 3b): power-law hub columns —
    which used to disqualify the 3-pass mode via the spill gate and drop
    the matrix to VMEM-RMW-bound mixed tiles — are peeled into their own
    lane-tile term whose x gathers into one compact VMEM window, and the
    residual passes the tstream gates. End-to-end vs scipy."""
    from uspmv_tpu.io.generators import powerlaw_cols
    from uspmv_tpu.runtime.operator import SpmvOperator
    from uspmv_tpu.runtime.tstream import TStreamDev

    m = powerlaw_cols(20_000, 8, seed=3)
    cfg = Config(kernel_format="scs", chunk_size=1024, sigma=1,
                 value_type="sp", backend="cpu", mixed_tiles=True)
    op = SpmvOperator.from_mtx(cfg, m)
    assert op.impl_name() == "pallas-tstream"
    dev = next(iter(op.devs.values()))
    assert isinstance(dev, TStreamDev)
    assert dev.hub is not None, "hub term must engage on power-law cols"
    # nnz accounting still covers every element across the split terms
    assert op.nnz == m.nnz
    A = m.to_scipy().astype(np.float64)
    x = np.random.default_rng(4).standard_normal(m.n_rows)
    y = op.to_host(op.spmv(op.make_x(x)))
    ref = A @ x
    rel_l2 = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    assert rel_l2 < 5e-6, rel_l2


def test_compact_scs_pack_parity():
    """CompactScs (padded-extent-free tstream build, formats/scs.py)
    packs bit-identically to the padded SCS under the same fixed
    permutation — both through the native packer and the Python twin.
    The padded intermediate reached ~120x nnz on pareto rows and cost
    ~560 s of a 644 s 500k-row operator build (round-5 profile)."""
    from uspmv_tpu.formats.coo import MtxData
    from uspmv_tpu.formats.scs import convert_to_scs_compact
    from uspmv_tpu.ops.packer import pack_product_tiles

    m = random_imbalanced(20_000, 8, seed=5)
    m2, _ = split_heavy_rows(m, 2048)
    n = m2.n_rows
    nch = (n + 1023) // 1024
    perm = np.arange(nch * 1024, dtype=np.int32)
    mp = MtxData.from_arrays(
        m2.I, m2.J, m2.values, n_rows=n, n_cols=nch * 1024, is_sorted=True
    )
    sc_pad = convert_to_scs(
        mp.astype(np.float32), 1024, 1, fixed_permutation=perm
    )
    sc_cmp = convert_to_scs_compact(mp, 1024, perm, dtype=np.float32)
    assert sc_cmp.n_elements == sc_pad.n_elements
    assert abs(sc_cmp.beta - sc_pad.beta) < 1e-12
    for native in (None, False):  # native lib, then the Python twin
        a = pack_product_tiles(sc_pad, s_cap_factor=2.0, native=native)
        b = pack_product_tiles(sc_cmp, s_cap_factor=2.0, native=native)
        for f in ("vals", "src_tab", "w_row", "elem_rows", "elem_pos",
                  "spill_rows", "spill_cols", "spill_vals"):
            np.testing.assert_array_equal(
                getattr(a, f), getattr(b, f), err_msg=f
            )
        assert (a.NB, a.NCg, a.s_pad, a.nnz_packed) == (
            b.NB, b.NCg, b.s_pad, b.nnz_packed
        )
