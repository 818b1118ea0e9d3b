#!/usr/bin/env python
"""SuiteSparse matrix fetcher (reference scripts/sparsematrixdown.sh).

Downloads the reference's intended benchmark set from the SuiteSparse
collection (sparse.tamu.edu) and unpacks the .mtx files. Network access is
required; in an air-gapped environment this exits gracefully with a message
(the bench then falls back to generated matrices).

Usage: python scripts/fetch_suitesparse.py [--dest DIR] [names ...]
"""

import argparse
import os
import sys
import tarfile
import urllib.request

# reference set (scripts/check_perf.sh:31-35, sparsematrixdown.sh:1-22)
DEFAULT_SET = {
    "Long_Coup_dt0": "Janna/Long_Coup_dt0",
    "ML_Geer": "Janna/ML_Geer",
    "af_shell10": "Schenk_AFE/af_shell10",
    "dlr1": "VLSI/dlr1",
    "Transport": "Janna/Transport",
    "vas_stokes_1M": "VLSI/vas_stokes_1M",
    "vas_stokes_2M": "VLSI/vas_stokes_2M",
    "vas_stokes_4M": "VLSI/vas_stokes_4M",
    "Queen_4147": "Janna/Queen_4147",
    "PFlow_742": "Janna/PFlow_742",
    "Cube_Coup_dt0": "Janna/Cube_Coup_dt0",
    "Cube_Coup_dt6": "Janna/Cube_Coup_dt6",
    "StocF-1465": "Janna/StocF-1465",
    "bcsstk16": "HB/bcsstk16",
}

BASE = "https://suitesparse-collection-website.herokuapp.com/MM"


def fetch(group_name: str, dest: str) -> str:
    name = group_name.split("/")[-1]
    url = f"{BASE}/{group_name}.tar.gz"
    tgz = os.path.join(dest, f"{name}.tar.gz")
    print(f"fetching {url}")
    urllib.request.urlretrieve(url, tgz)
    with tarfile.open(tgz) as tf:
        tf.extractall(dest, filter="data")
    os.remove(tgz)
    return os.path.join(dest, name, f"{name}.mtx")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest", default="matrices")
    ap.add_argument("names", nargs="*", default=list(DEFAULT_SET))
    args = ap.parse_args()
    os.makedirs(args.dest, exist_ok=True)
    failures = []
    for n in args.names:
        gn = DEFAULT_SET.get(n, n)
        try:
            path = fetch(gn, args.dest)
            print(f"  -> {path}")
        except Exception as e:  # noqa: BLE001
            failures.append((n, str(e)))
            print(f"  !! {n}: {e}", file=sys.stderr)
    if len(failures) == len(args.names):
        print(
            "no downloads succeeded (air-gapped environment?) — use the "
            "generated matrices (uspmv_tpu.io.generators / io.scamac) instead",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
