#!/usr/bin/env python
"""Hardware accuracy + speed check for -dp_emu (double-float dp on TPU).

Run on a machine with a real TPU. The CPU interpret path used by the unit
tests degrades the error-free transforms (the interpreter rewrites
A-(A-B) -> B, which is FP-unsafe), so THIS script is the authoritative
check that the Mosaic-compiled kernel keeps df64 accuracy.

Measured on a v5e (2026-08-16, Laplace3D-96, 6.1M nnz):
  dp_emu : 67.2 GFLOP/s, max rel 1.45e-14
  dp CPU : 1.4 GFLOP/s   (the honest alternative — axon computes
           f64-as-f32, so plain dp cannot run on this chip at all)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    import jax

    from uspmv_tpu.config import Config
    from uspmv_tpu.io.generators import laplace3d
    from uspmv_tpu.runtime.bench import bench_spmv
    from uspmv_tpu.runtime.operator import SpmvOperator

    if jax.devices()[0].platform == "cpu":
        print("no accelerator visible; this check needs a TPU")
        return 1
    mtx = laplace3d(96)
    cfg = Config(kernel_format="scs", chunk_size=1024, sigma=1,
                 value_type="dp", dp_emulation=True, bench_time=2.0)
    op = SpmvOperator.from_mtx(cfg, mtx)
    assert op.impl_name() == "pallas-lane-tiles-df64", op.impl_name()
    rng = np.random.default_rng(0)
    x = rng.standard_normal(mtx.n_rows)
    y = op.to_host(np.asarray(op.spmv(op.make_x(x))))
    ref = mtx.to_scipy().tocsr() @ x
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    print(f"dp_emu max rel error: {rel:.3e}")
    assert rel < 1e-12, f"hardware df64 accuracy regressed: {rel}"
    res = bench_spmv(op, timing_reps=3)
    print(f"dp_emu: {res.perf_gflops:.1f} GFLOP/s "
          f"({res.effective_gbps:.0f} GB/s effective)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
