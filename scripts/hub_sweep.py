"""Sweep the hub-column peel thresholds on PowerLawCols (real TPU).

The hub peel (runtime/operator.py) moves the heaviest columns of a
power-law matrix into their own lane-tile term with a compact VMEM x
window; the residual runs the 3-pass transpose-stream. Its three knobs
(USPMV_HUB_MULT: popularity cutoff in multiples of the mean column
count; USPMV_HUB_MAX_COLS: peel-size cap; USPMV_HUB_MIN_FRAC: minimum
peeled-nnz fraction for the extra kernel to be worth launching) were
chosen by eye in round 4. This records an actual sweep so the defaults
are measured, including the no-peel case as the control.

Reference context: the class this serves is the dlr1-style power-law
workload (/root/reference/scripts/check_perf.sh:31-35); the reference
degrades to CRS (/root/reference/code/kernels.hpp:22-63) — the peel is
the TPU-first counterpart.

Usage: python scripts/hub_sweep.py [n_rows] [avg_nnz]
Appends one record per config to spmv_bench.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

JSONL = os.path.join(os.path.dirname(__file__), "..", "spmv_bench.jsonl")


def bench_config(mtx, ref, x, mult, max_cols, min_frac):
    from uspmv_tpu.config import Config
    from uspmv_tpu.runtime.bench import bench_spmv
    from uspmv_tpu.runtime.operator import SpmvOperator

    os.environ["USPMV_HUB_MULT"] = str(mult)
    os.environ["USPMV_HUB_MAX_COLS"] = str(max_cols)
    os.environ["USPMV_HUB_MIN_FRAC"] = str(min_frac)
    cfg = Config(kernel_format="scs", chunk_size=1024, sigma=1,
                 value_type="sp", bench_time=1.0, use_pallas=True,
                 mixed_tiles=True)
    t0 = time.monotonic()
    op = SpmvOperator.from_mtx(cfg, mtx)
    build_s = time.monotonic() - t0
    y = op.to_host(op.spmv(op.make_x(x)))
    rel = float(np.abs(y - ref).max() / np.abs(ref).max())
    res = bench_spmv(op, warmup=10, start_iters=64, timing_reps=3)
    dev = next(iter(op.devs.values()))
    hub = getattr(dev, "hub", None)
    hub_nnz = int(getattr(hub, "nnz", 0) or 0) if hub is not None else 0
    rec = {
        "metric": "hub_sweep",
        "matrix": f"PowerLawCols-{mtx.n_rows}",
        "impl": op.impl_name(),
        "hub_mult": mult,
        "hub_max_cols": max_cols,
        "hub_min_frac": min_frac,
        "hub_nnz": hub_nnz,
        "gflops": round(res.perf_gflops, 2),
        "us_per_iter": round(
            res.duration_kernel_s / max(res.n_iterations, 1) * 1e6, 1),
        "max_rel_err": rel,
        "build_s": round(build_s, 1),
        "_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "_source": "scripts/hub_sweep.py",
    }
    print(json.dumps(rec), flush=True)
    with open(JSONL, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def main() -> int:
    from uspmv_tpu.io.generators import powerlaw_cols

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    avg = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    mtx = powerlaw_cols(n_rows, avg)
    sp = mtx.to_scipy().astype(np.float64)
    x = np.random.default_rng(5).standard_normal(mtx.n_rows)
    ref = sp @ x
    print(f"PowerLawCols n={n_rows} nnz={mtx.nnz}", flush=True)

    results = []
    # control: peel disabled (min_frac unreachable)
    results.append(bench_config(mtx, ref, x, 8, 4096, 10.0))
    # cutoff sweep at the default cap
    for mult in (2, 4, 8, 16, 32):
        results.append(bench_config(mtx, ref, x, mult, 4096, 0.04))
    # cap sweep at the best cutoff
    best = max(results[1:], key=lambda r: r["gflops"])
    for cap in (1024, 2048, 8192, 16384):
        results.append(
            bench_config(mtx, ref, x, best["hub_mult"], cap, 0.04))

    results.sort(key=lambda r: -r["gflops"])
    print(f"\n{'mult':>5} {'cap':>6} {'minfrac':>7} {'GFLOP/s':>8} "
          f"{'us/iter':>8} {'rel_err':>9}")
    for r in results:
        print(f"{r['hub_mult']:>5} {r['hub_max_cols']:>6} "
              f"{r['hub_min_frac']:>7} {r['gflops']:>8} "
              f"{r['us_per_iter']:>8} {r['max_rel_err']:>9.2e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
