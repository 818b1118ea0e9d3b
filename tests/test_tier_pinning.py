"""Pin which kernel tier each BENCH matrix class selects (VERDICT r5
item 6): round 4's hub peel silently re-routed PowerLawCols from working
mixed tiles into a tier that could not lower on TPU, and no test noticed
because nothing asserted the tier choice for the bench matrices. These
tests fail CI when a gating change re-routes a bench class.

The gate stack under test (runtime/operator.py from_mtx):
  _window_fill_estimate < MIXED_EST_CUTOFF  -> zero-locality tiers
    -> _try_tstream (with hub peel)         -> transpose-stream
    -> mixed tiles                          -> masked mixed tiles
  else                                      -> lane tiles
"""

import numpy as np
import pytest

from uspmv_tpu.config import Config
from uspmv_tpu.io.generators import (
    banded_imbalanced,
    fem_tet3d,
    laplace3d,
    powerlaw_cols,
    random_imbalanced,
)
from uspmv_tpu.runtime.operator import (
    MIXED_EST_CUTOFF,
    SpmvOperator,
    _window_fill_estimate,
)


# ------------- the cheap gate, at the real bench sizes (platform-free)

def test_estimator_routes_bench_matrices():
    """The fill estimator must send the zero-locality bench matrices to
    the mixed/tstream tiers and keep the banded/FEM ones on lane tiles —
    at the EXACT specs bench.py uses."""
    zero_locality = {
        "random_imbalanced_500k": random_imbalanced(500_000, 8),
        "powerlaw_cols_500k": powerlaw_cols(500_000, 8),
    }
    lane_tiles = {
        "banded_imbalanced_500k": banded_imbalanced(
            500_000, bandwidth=64, avg_nnz_per_row=8, seed=7),
        "fem_tet3d_55": fem_tet3d(55),
    }
    for name, m in zero_locality.items():
        est = _window_fill_estimate(m)
        assert est < MIXED_EST_CUTOFF, (name, est)
    for name, m in lane_tiles.items():
        est = _window_fill_estimate(m)
        assert est >= MIXED_EST_CUTOFF, (name, est)


def test_headline_estimator_stays_on_lane_tiles():
    m = laplace3d(48)  # scaled headline stand-in (same stencil class)
    assert _window_fill_estimate(m) >= MIXED_EST_CUTOFF


# ------------- full builds at reduced size (same class structure)

def _build(m, **kw):
    cfg = Config(kernel_format="scs", chunk_size=1024, sigma=1,
                 value_type="sp", backend="cpu", **kw)
    return SpmvOperator.from_mtx(cfg, m)


@pytest.mark.slow
def test_random_imbalanced_lands_on_tstream():
    op = _build(random_imbalanced(30_000, 8, seed=1), mixed_tiles=True)
    assert op.impl_name() == "pallas-tstream"


@pytest.mark.slow
def test_powerlaw_cols_lands_on_tstream_with_hub_peel():
    """PowerLawCols must land on (hub peel + tstream) or mixed tiles —
    never the XLA fallback; if it lands on tstream, the hub term must
    exist (that's what makes the class pass the spill gate)."""
    op = _build(powerlaw_cols(60_000, 8), mixed_tiles=True)
    impl = op.impl_name()
    assert impl in ("pallas-tstream", "pallas-mixed-tiles"), impl
    if impl == "pallas-tstream":
        dev = next(iter(op.devs.values()))
        assert dev.hub is not None, "hub peel did not engage"


@pytest.mark.slow
def test_banded_imbalanced_lands_on_lane_tiles():
    op = _build(banded_imbalanced(60_000, bandwidth=64,
                                  avg_nnz_per_row=8, seed=7))
    assert op.impl_name() == "pallas-lane-tiles"
