"""Golden-fixture tests ported from the reference test suite.

The matrices and expected outputs re-state the reference's hand-written
fixtures (test_suite/test_data/M_big.cpp:1-253, driven by test_suite/
tests.cpp:141-275): the 10x10 M_big matrix, its magnitude split at
threshold 1.0 into high/low-precision sub-matrices, and their expected
SELL-C-sigma structures at (C=1, sigma=2) and (C=1, sigma=128). The
reference's std::sort tie order coincides with stable descending order on
these fixtures, so array-level equality holds for our stable sorter too.
"""

import numpy as np
import pytest

from uspmv_tpu.formats.coo import MtxData
from uspmv_tpu.formats.scs import convert_to_scs
from uspmv_tpu.precision.partition import partition_precisions

# reference M_big (test_data/M_big.cpp:4-13)
M_BIG = MtxData.from_arrays(
    I=[0, 0, 0, 1, 2, 2, 2, 3, 4, 5, 5, 5, 6, 7, 7, 7, 8, 9],
    J=[0, 3, 4, 1, 0, 1, 2, 3, 4, 5, 8, 9, 6, 5, 6, 7, 8, 9],
    values=[.11, 14, 15, .22, 31, 32, .33, 44, 55, .66, 69, .610,
            77, 86, 87, 88, .99, 1010],
    n_rows=10, n_cols=10, is_sorted=True,
)


@pytest.fixture
def split():
    """Magnitude split at threshold 1.0 (the ancestor seperate_lp_from_hp,
    tests.cpp:8-24): dp = |a| >= 1, sp = |a| < 1."""
    subs, dropped = partition_precisions(M_BIG, "ap[dp_sp]", 1.0)
    assert dropped == 0
    return subs


def test_split_matches_reference_fixtures(split):
    # exp_M_big_lp (M_big.cpp:16-26)
    lp = split["sp"]
    np.testing.assert_array_equal(lp.I, [0, 1, 2, 5, 5, 8])
    np.testing.assert_array_equal(lp.J, [0, 1, 2, 5, 9, 8])
    np.testing.assert_allclose(
        lp.values.astype(np.float64), [.11, .22, .33, .66, .610, .99],
        rtol=1e-6,
    )
    # exp_M_big_hp (M_big.cpp:136-145)
    hp = split["dp"]
    np.testing.assert_array_equal(hp.I, [0, 0, 2, 2, 3, 4, 5, 6, 7, 7, 7, 9])
    np.testing.assert_array_equal(hp.J, [3, 4, 0, 1, 3, 4, 8, 6, 5, 6, 7, 9])
    np.testing.assert_allclose(
        hp.values, [14, 15, 31, 32, 44, 55, 69, 77, 86, 87, 88, 1010]
    )


def _assert_scs(scs, chunk_ptrs, chunk_lengths, col_idxs, values,
                old_to_new, new_to_old):
    np.testing.assert_array_equal(scs.chunk_ptrs, chunk_ptrs)
    np.testing.assert_array_equal(scs.chunk_lengths, chunk_lengths)
    np.testing.assert_array_equal(scs.col_idxs, col_idxs)
    np.testing.assert_allclose(scs.values.astype(np.float64), values,
                               rtol=1e-6)
    np.testing.assert_array_equal(scs.old_to_new_idx, old_to_new)
    np.testing.assert_array_equal(scs.new_to_old_idx, new_to_old)


def test_lp_scs_1_2(split):
    """explicit_exp_M_big_lp_scs_1_2 (M_big.cpp:44-51)."""
    scs = convert_to_scs(split["sp"], 1, 2)
    _assert_scs(
        scs,
        chunk_ptrs=[0, 1, 2, 3, 3, 5, 5, 5, 5, 6, 6],
        chunk_lengths=[1, 1, 1, 0, 2, 0, 0, 0, 1, 0],
        col_idxs=[0, 1, 2, 5, 9, 8],
        values=[.11, .22, .33, .66, .610, .99],
        old_to_new=[0, 1, 2, 3, 5, 4, 6, 7, 8, 9],
        new_to_old=[0, 1, 2, 3, 5, 4, 6, 7, 8, 9],
    )


def test_lp_scs_1_128(split):
    """explicit_exp_M_big_lp_scs_1_128 (M_big.cpp:98-105)."""
    scs = convert_to_scs(split["sp"], 1, 128)
    _assert_scs(
        scs,
        chunk_ptrs=[0, 2, 3, 4, 5, 6, 6, 6, 6, 6, 6],
        chunk_lengths=[2, 1, 1, 1, 1, 0, 0, 0, 0, 0],
        col_idxs=[5, 9, 0, 1, 2, 8],
        values=[.66, .610, .11, .22, .33, .99],
        old_to_new=[1, 2, 3, 5, 6, 0, 7, 8, 4, 9],
        new_to_old=[5, 0, 1, 2, 8, 3, 4, 6, 7, 9],
    )


def test_hp_scs_1_2(split):
    """explicit_exp_M_big_hp_scs_1_2 (M_big.cpp:165-172)."""
    scs = convert_to_scs(split["dp"], 1, 2)
    _assert_scs(
        scs,
        chunk_ptrs=[0, 2, 2, 4, 5, 6, 7, 10, 11, 12, 12],
        chunk_lengths=[2, 0, 2, 1, 1, 1, 3, 1, 1, 0],
        col_idxs=[3, 4, 0, 1, 3, 4, 8, 5, 6, 7, 6, 9],
        values=[14, 15, 31, 32, 44, 55, 69, 86, 87, 88, 77, 1010],
        old_to_new=[0, 1, 2, 3, 4, 5, 7, 6, 9, 8],
        new_to_old=[0, 1, 2, 3, 4, 5, 7, 6, 9, 8],
    )


def test_hp_scs_1_128(split):
    """explicit_exp_M_big_hp_scs_1_128 (M_big.cpp:219-226)."""
    scs = convert_to_scs(split["dp"], 1, 128)
    _assert_scs(
        scs,
        chunk_ptrs=[0, 3, 5, 7, 8, 9, 10, 11, 12, 12, 12],
        chunk_lengths=[3, 2, 2, 1, 1, 1, 1, 1, 0, 0],
        col_idxs=[5, 6, 7, 3, 4, 0, 1, 3, 4, 8, 6, 9],
        values=[86, 87, 88, 14, 15, 31, 32, 44, 55, 69, 77, 1010],
        old_to_new=[1, 8, 2, 3, 4, 5, 6, 0, 9, 7],
        new_to_old=[7, 0, 2, 3, 4, 5, 6, 9, 1, 8],
    )


@pytest.mark.parametrize("native", [False, True])
def test_goldens_native_and_python(split, native):
    """Both converter implementations reproduce the reference goldens."""
    from uspmv_tpu import native as native_mod

    if native and not native_mod.available():
        pytest.skip("native host library not built")
    scs = convert_to_scs(split["sp"], 1, 128, native=native)
    np.testing.assert_array_equal(
        scs.old_to_new_idx, [1, 2, 3, 5, 6, 0, 7, 8, 4, 9]
    )
