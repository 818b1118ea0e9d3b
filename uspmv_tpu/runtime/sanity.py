"""Debug-mode sanity checker.

Re-design of the reference's ``SanityChecker`` (sanity_checker.hpp:9-353,
DEBUG_MODE_FINE): stage-labelled dumps of x/y around comm/spmv/swap plus
structural invariant checks (permutation validity, SCS padding placement,
halo-plan consistency). Enabled via ``Config.debug_mode``; dumps go to
``Config.output_dir``/uspmv_debug_rank<r>.log like the reference's per-rank
stdout ladders.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class SanityChecker:
    """Collects stage dumps and runs invariant checks.

    Methods mirror the reference's check_* entry points; each either writes
    a labelled dump (vector stages) or raises AssertionError with a precise
    message (structural checks).
    """

    def __init__(self, output_dir: str = ".", rank: int = 0,
                 max_elems: int = 32, enabled: bool = True):
        self.enabled = enabled
        self.rank = rank
        self.max_elems = max_elems
        self.path = os.path.join(output_dir, f"uspmv_debug_rank{rank}.log")
        if enabled and os.path.exists(self.path):
            os.remove(self.path)

    # ------------------------------------------------------------- dumps

    def _write(self, text: str) -> None:
        with open(self.path, "a") as f:
            f.write(text)

    def dump_vector(self, label: str, vec, n_rows: Optional[int] = None):
        """Stage dump (reference check_vectors_before/after_*,
        sanity_checker.hpp:22-180)."""
        if not self.enabled:
            return
        v = np.asarray(vec).reshape(-1)
        head = v[: self.max_elems]
        self._write(
            f"[rank {self.rank}] {label}: shape={np.asarray(vec).shape} "
            f"n_rows={n_rows if n_rows is not None else len(v)} "
            f"head={np.array2string(head, precision=6, max_line_width=120)}\n"
        )

    def dump_stage(self, stage: str, **vectors):
        """Dump several vectors under one stage label, e.g.
        dump_stage('before_spmv', x=x, y=y)."""
        for name, vec in vectors.items():
            self.dump_vector(f"{stage}.{name}", vec)

    # ------------------------------------------------------------ checks

    def check_perm(self, perm, n: Optional[int] = None):
        """Permutation is a bijection on [0, n) (reference perm checks in
        ScsData::permute, classes_structs.hpp:1707-1714)."""
        if not self.enabled:
            return
        p = np.asarray(perm)
        n = n if n is not None else p.size
        if p.size != n:
            raise AssertionError(f"perm has {p.size} entries, expected {n}")
        seen = np.zeros(n, dtype=bool)
        if (p < 0).any() or (p >= n).any():
            raise AssertionError("perm entry out of range")
        seen[p] = True
        if not seen.all():
            missing = int(np.flatnonzero(~seen)[0])
            raise AssertionError(f"perm is not a bijection (missing {missing})")

    def check_scs_padding(self, scs):
        """Structural zero padding carries value 0 and column 0 within local
        range (reference padding checks, sanity_checker.hpp:200-260)."""
        if not self.enabled:
            return
        pad = scs.padding_mask()
        vals = np.asarray(scs.values, dtype=np.float64)
        if (vals[pad] != 0.0).any():
            raise AssertionError("SCS padding slot holds a nonzero value")

    def check_halo_plan(self, plan, n_local_rows: int):
        """Every recv index lands in the halo region; send indices are
        local (reference mismatched-buffer check,
        classes_structs.hpp:934-939)."""
        if not self.enabled:
            return
        for nbr, idxs in enumerate(getattr(plan, "send_idxs", []) or []):
            a = np.asarray(idxs)
            if a.size and ((a < 0).any() or (a >= n_local_rows).any()):
                raise AssertionError(
                    f"send idx out of local range for neighbor {nbr}"
                )

    def check_finite(self, label: str, vec):
        if not self.enabled:
            return
        v = np.asarray(vec, dtype=np.float64)
        if not np.isfinite(v).all():
            bad = int(np.flatnonzero(~np.isfinite(v.reshape(-1)))[0])
            raise AssertionError(f"{label}: non-finite value at flat index {bad}")
