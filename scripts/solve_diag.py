"""Diagnose the fused multi-iteration solve kernel (VERDICT r5 item 3).

Round 4 recorded solve-fused at 2.43 GFLOP/s (~69 us/iter) on bcsstk13 —
22x below the round-3 launch-bound bench-mode chain — with no
accompanying analysis. This script separates per-iteration cost from
fixed launch cost for the three ways the framework can run k chained
SpMVs (y = A x; x <- y — reference solve loop, main.cpp:528-607):

  solve-fused  ONE Pallas launch, grid=(k, ns), VMEM ping-pong
               (ops/pallas_scs.solve_lane_tiles)
  solve-scan   lax.scan of k single-SpMV kernel launches
  bench-chain  the bench harness's fori_loop of SpMVs (x + eps re-feed;
               not a true swap, but the launch-cost yardstick round 3's
               17.8 GFLOP/s number came from)

For each mode it times total wall clock at several k and fits
t(k) = a + b*k; b is the honest per-iteration cost. Appends one JSON
row per (matrix, mode) to spmv_bench.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _fit_slope(ks, ts):
    ks = np.asarray(ks, dtype=np.float64)
    ts = np.asarray(ts, dtype=np.float64)
    b, a = np.polyfit(ks, ts, 1)
    return float(a), float(b)


def _time_call(fn, reps=5):
    fn()  # compile / warm
    fn()
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return float(np.median(samples))


def run_matrix(name, mtx, ks=(1, 8, 64, 512), out_rows=None):
    import jax
    import jax.numpy as jnp

    from uspmv_tpu.config import Config
    from uspmv_tpu.runtime.operator import SpmvOperator

    cfg = Config(kernel_format="scs", chunk_size=1024, sigma=1,
                 value_type="sp", use_pallas=True)
    op = SpmvOperator.from_mtx(cfg, mtx)
    x = op.make_x()
    nnz = op.nnz
    print(f"== {name}: {mtx.n_rows} rows, {nnz} nnz, "
          f"impl {op.impl_name()}, fused-eligible "
          f"{op._fused_solve_eligible()}")

    modes = {}

    def solve_runner():
        solve_fn = op._solve_fn()

        def run(k):
            _, y = solve_fn(op.kernel_args, x, k)
            return float(jnp.sum(y, dtype=jnp.float32))

        return run

    if op._fused_solve_eligible():
        op._jit_solve = None
        modes["solve-fused"] = solve_runner()
    # force the scan-of-launches path
    orig = op._fused_solve_eligible
    op._fused_solve_eligible = lambda: False
    op._jit_solve = None
    modes["solve-scan"] = solve_runner()
    op._fused_solve_eligible = orig

    # bench-mode chain (the fori_loop the bench harness uses)
    from uspmv_tpu.runtime.bench import _make_runner

    runner, eps = _make_runner(op), None
    try:
        from uspmv_tpu.runtime.bench import _EPS_LEN

        eps = jnp.zeros(_EPS_LEN, dtype=jnp.float32)
    except Exception:
        eps = jnp.zeros(256, dtype=jnp.float32)

    def bench_chain(k):
        return float(runner(op.kernel_args, x, eps, k))

    modes["bench-chain"] = bench_chain

    results = {}
    for mode, fn in modes.items():
        ts = []
        for k in ks:
            ts.append(_time_call(lambda k=k: fn(int(k))))
        a, b = _fit_slope(ks, ts)
        gflops = 2.0 * nnz / b / 1e9 if b > 0 else None  # noise-dominated fit
        results[mode] = dict(
            launch_us=round(a * 1e6, 1),
            per_iter_us=round(b * 1e6, 2),
            gflops_asymptotic=None if gflops is None else round(gflops, 2),
            total_s={int(k): round(t, 5) for k, t in zip(ks, ts)},
        )
        print(f"  {mode:12s} launch {a*1e6:8.1f} us  per-iter "
              f"{b*1e6:8.2f} us  -> {gflops if gflops is None else round(gflops, 2)} GFLOP/s asymptotic")
        if out_rows is not None:
            out_rows.append(dict(
                metric=f"solve_diag_{name}_{mode}",
                per_iter_us=results[mode]["per_iter_us"],
                launch_us=results[mode]["launch_us"],
                gflops_asymptotic=results[mode]["gflops_asymptotic"],
                ks=list(map(int, ks)),
                _source="scripts/solve_diag.py",
                _utc=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            ))
    return results


def main():
    from uspmv_tpu.io.generators import laplace3d
    from uspmv_tpu.io.mmio import read_mtx

    rows = []
    p = "/root/reference/matrices/bcsstk13.mtx"
    if os.path.exists(p):
        run_matrix("bcsstk13", read_mtx(p), out_rows=rows)
    run_matrix("laplace3d_48", laplace3d(48), ks=(1, 8, 64, 128),
               out_rows=rows)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "spmv_bench.jsonl")
    with open(path, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"appended {len(rows)} rows to {path}")


if __name__ == "__main__":
    main()
