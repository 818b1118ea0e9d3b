#!/usr/bin/env python
"""Validation campaign — the reference's SLURM validate.sh sweep
(scripts/validate{,_master,_no_mpi,_one_proc,_multi_proc}.sh) as one script.

Sweeps C x sigma x precision x rand_x x seg_method x shards in SOLVE mode on
the bundled small matrices, each run through the real CLI driver
(python -m uspmv_tpu.cli ... -mode s -validate 1), which validates against
scipy.sparse (the MKL stand-in) at the reference tolerances and exits
nonzero on ERROR — the reference campaign greps its compare files for
"ERROR" the same way (validate.sh:24-46).

Usage:
  python scripts/validate_campaign.py [--quick] [--matrices m.mtx ...]
  [--shards N] [--platform cpu|tpu]
"""

import argparse
import itertools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="reduced sweep")
    ap.add_argument("--matrices", nargs="*", default=None)
    ap.add_argument("--shards", type=int, default=1)
    # default cpu: this is the oracle-correctness campaign (the reference
    # validates against CPU MKL, validate.sh); --platform tpu opts into
    # on-chip validation when the tunnel is up
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument(
        "--multihost", action="store_true",
        help="additionally run a reduced sweep on a REAL 2-process gloo "
        "cluster (the reference validate_multi_proc.sh analogue); each "
        "config launches two subprocesses through the public CLI",
    )
    args = ap.parse_args()

    if args.platform == "cpu":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        if args.shards > 1:
            os.environ.setdefault(
                "XLA_FLAGS",
                f"--xla_force_host_platform_device_count={args.shards}",
            )
        # the env var is NOT enough: the axon plugin force-prepends
        # itself over JAX_PLATFORMS, so with the tunnel down every CLI
        # run would eat a full backend-init hang timeout (verified live
        # this round: the sweep crawled at 300 s/run). The jax.config
        # pin wins (runtime/backend.pin_cpu, same fix as conftest.py).
        from uspmv_tpu.runtime.backend import pin_cpu

        pin_cpu()

    from uspmv_tpu import cli

    default_dir = "/root/reference/matrices"
    matrices = args.matrices or [
        os.path.join(default_dir, f)
        for f in ("FDM-2d-16.mtx", "matrix1.mtx", "impcol_e.mtx")
        if os.path.exists(os.path.join(default_dir, f))
    ]
    if not matrices:
        print("no matrices found", file=sys.stderr)
        return 2

    # reference sweep: C,sigma in {1,2,3,4,8,10,16,32,64}^2 (validate.sh)
    cs = [1, 2, 4, 16] if args.quick else [1, 2, 3, 4, 8, 10, 16, 32, 64]
    sigmas = [1, 4, 64] if args.quick else [1, 2, 3, 4, 8, 10, 16, 32, 64]
    precs = ["-dp", "-sp"] if args.quick else ["-dp", "-sp", "-hp", "-ap"]
    rand_x = ["0", "1"]
    out_dir = os.environ.get("USPMV_CAMPAIGN_DIR", "/tmp/uspmv_campaign")
    os.makedirs(out_dir, exist_ok=True)

    n_runs = n_fail = 0
    for path, C, sigma, prec, rx in itertools.product(
        matrices, cs, sigmas, precs, rand_x
    ):
        fmt = "crs" if (C == 1 and sigma == 1) else "scs"
        argv = [
            path, fmt, "-c", str(C), "-s", str(sigma),
            "-mode", "s", "-rev", "3", "-validate", "1",
            "-rand_x", rx, "-mtx_out", out_dir,
            "-n_shards", str(args.shards),
        ]
        if prec == "-ap":
            argv += ["-ap_value_type", "ap[dp_sp]", "-ap_threshold_1", "0.5"]
        else:
            argv.append(prec)
        n_runs += 1
        try:
            rc = cli.main(argv)
        except Exception as e:  # noqa: BLE001 - campaign must keep going
            rc = 3
            print(f"EXCEPTION {os.path.basename(path)} C={C} s={sigma} "
                  f"{prec} rand_x={rx}: {e}")
        if rc != 0:
            n_fail += 1
            print(f"ERROR rc={rc} {os.path.basename(path)} C={C} "
                  f"sigma={sigma} {prec} rand_x={rx}")
    # round-2 paths: the BCOO comparison baseline, heavy-row splitting +
    # vectorized fold, and dp-on-chip emulation, each through the same
    # solve+validate harness
    extra_runs = [
        ["-impl", "bcoo", "-sp"],
        ["-c", "1024", "-s", "1", "-sp", "-split_rows_threshold", "6"],
        ["-c", "1024", "-s", "1", "-dp", "-dp_emu", "1"],
    ]
    for path in matrices[:1]:
        for extra in extra_runs:
            fmt = "scs" if "-c" in extra else "crs"
            argv = [path, fmt, "-mode", "s", "-rev", "2", "-validate", "1",
                    "-mtx_out", out_dir] + extra
            n_runs += 1
            try:
                rc = cli.main(argv)
            except Exception as e:  # noqa: BLE001
                rc = 3
                print(f"EXCEPTION {os.path.basename(path)} {extra}: {e}")
            if rc != 0:
                n_fail += 1
                print(f"ERROR rc={rc} {os.path.basename(path)} {extra}")
    # round-4 paths: the zero-locality tiers (transpose-stream with hub
    # peel / cell-cap spills; mixed tiles at bs > 1) through the same
    # solve+validate harness — sharded when --shards > 1 (the stacked
    # tstream / stacked mixed tiles)
    zl_runs = [
        ("RandomImbalanced,20000,8",
         ["-c", "1024", "-s", "1", "-sp", "-mixed_tiles", "1"]),
        ("PowerLawCols,20000,8",
         ["-c", "1024", "-s", "1", "-sp", "-mixed_tiles", "1"]),
        ("RandomImbalanced,20000,8",
         ["-c", "1024", "-s", "1", "-sp", "-mixed_tiles", "1",
          "-block_vec_size", "2", "-layout", "rowwise"]),
    ]
    for spec, extra in zl_runs:
        argv = [spec, "scs", "-mode", "s", "-rev", "2", "-validate", "1",
                "-mtx_out", out_dir, "-n_shards", str(args.shards)] + extra
        n_runs += 1
        try:
            rc = cli.main(argv)
        except Exception as e:  # noqa: BLE001
            rc = 3
            print(f"EXCEPTION {spec} {extra}: {e}")
        if rc != 0:
            n_fail += 1
            print(f"ERROR rc={rc} {spec} {extra}")
    if args.multihost:
        # 2-process cluster sweep (reference validate_multi_proc.sh):
        # every config runs as two real subprocesses wired by
        # jax.distributed over gloo, validated on process 0
        import socket
        import subprocess

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        mh_configs = [
            ["scs", "-c", "4", "-s", "8", "-sp"],
            ["crs", "-dp", "-rand_x", "1"],
            ["scs", "-c", "1024", "-s", "1", "-sp", "-seg_method",
             "seg-nnz"],
        ]
        for path in matrices[:1]:
            for extra in mh_configs:
                s = socket.socket()
                s.bind(("127.0.0.1", 0))
                port = s.getsockname()[1]
                s.close()
                env = dict(os.environ)
                env.pop("JAX_PLATFORMS", None)
                env.pop("XLA_FLAGS", None)
                env["PYTHONPATH"] = repo
                procs = [
                    subprocess.Popen(
                        [sys.executable, "-m", "uspmv_tpu.cli", path,
                         *extra, "-mode", "s", "-rev", "2", "-validate",
                         "1", "-n_shards", "4", "-mtx_out", out_dir,
                         "-coordinator", f"localhost:{port}",
                         "-n_processes", "2", "-process_id", str(pid),
                         "-local_devices", "2", "-backend", "cpu"],
                        cwd=repo, env=env,
                    )
                    for pid in range(2)
                ]
                rcs = [p.wait(timeout=600) for p in procs]
                n_runs += 1
                if any(rcs):
                    n_fail += 1
                    print(f"ERROR multihost rc={rcs} "
                          f"{os.path.basename(path)} {extra}")
    print(f"campaign: {n_runs} runs, {n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
