"""Probe the FUSED phase-1+2 transpose-stream kernel on real TPU.

Round 5 bisected two upstream Mosaic blockers (Python-unroll recursion in
the remote compiler; a tpu.dynamic_gather-inside-fori_loop verifier bug)
and re-formulated the tile sweep as Pallas GRID dimensions — constant
trace depth, gathers in straight-line code. This script answers the two
questions that decide whether fused becomes the default:

  1. does the grid formulation LOWER and run on the v5e?
  2. does removing the phase-2 XLA transpose (a full HBM round trip of
     the padded product grid) beat the unfused 3-pass pipeline?

Usage: python scripts/tstream_fused_probe.py [n_rows] [avg_nnz]
Appends one record per variant to spmv_bench.jsonl.
"""

import json
import os
import sys
import time
import warnings

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(n_rows: int, avg: int) -> int:
    from uspmv_tpu.config import Config
    from uspmv_tpu.io.generators import random_imbalanced
    from uspmv_tpu.runtime.bench import bench_spmv
    from uspmv_tpu.runtime.operator import SpmvOperator

    mtx = random_imbalanced(n_rows, avg, seed=3)
    sp = mtx.to_scipy().astype(np.float64)
    x = np.random.default_rng(5).standard_normal(mtx.n_rows)
    ref = sp @ x

    results = {}
    for fused in (True, False):
        if fused:
            os.environ["USPMV_TSTREAM_FUSED"] = "1"
        else:
            os.environ.pop("USPMV_TSTREAM_FUSED", None)
        cfg = Config(kernel_format="scs", chunk_size=1024, sigma=1,
                     value_type="sp", bench_time=1.5, use_pallas=True,
                     mixed_tiles=True)
        t0 = time.monotonic()
        caught = []
        with warnings.catch_warnings(record=True) as wlist:
            warnings.simplefilter("always")
            op = SpmvOperator.from_mtx(cfg, mtx)
            caught = [str(w.message)[:200] for w in wlist]
        build_s = time.monotonic() - t0
        p1_types = sorted(
            type(getattr(d, "p1", None)).__name__
            for d in op.devs.values()
        )
        y = op.to_host(op.spmv(op.make_x(x)))
        rel = float(np.abs(y - ref).max() / np.abs(ref).max())
        res = bench_spmv(op, warmup=10, start_iters=64, timing_reps=3)
        rec = {
            "metric": f"tstream_fused_probe[{'fused' if fused else 'unfused'}]",
            "matrix": f"RandomImbalanced-{n_rows}",
            "impl": op.impl_name(),
            "p1": p1_types,
            "gflops": round(res.perf_gflops, 2),
            "us_per_iter": round(
                res.duration_kernel_s / max(res.n_iterations, 1) * 1e6, 1
            ),
            "max_rel_err": rel,
            "build_s": round(build_s, 1),
            "warnings": caught,
            "_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "_source": "scripts/tstream_fused_probe.py",
        }
        results["fused" if fused else "unfused"] = rec
        print(json.dumps(rec))
        with open(os.path.join(os.path.dirname(__file__), "..",
                               "spmv_bench.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
    f, u = results.get("fused"), results.get("unfused")
    if f and u and isinstance(f["gflops"], float) and f["gflops"] > 0:
        print(f"fused/unfused speedup: {f['gflops'] / u['gflops']:.3f}x")
    return 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    a = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sys.exit(run(n, a))
