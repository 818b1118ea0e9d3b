"""Outage-hardening tests (VERDICT r3 weak #1/#2, next-round item 1).

Each test launches a subprocess whose ``sitecustomize`` registers a
broken high-priority accelerator backend and force-pins jax_platforms to
it (tests/fixtures/broken_tpu_site/) — a fail-fast stand-in for the axon
tunnel being down. The contract under test:

* ``-backend cpu`` must complete (the pin-before-first-device-query fix,
  cli.py / runtime/backend.pin_cpu);
* ``-backend tpu`` must exit with ONE clean error line, rc=3, after the
  bounded retry (no traceback hostage-taking);
* ``bench.py`` must emit a PARSEABLE JSON record with an ``error`` field
  instead of dying rc=1 like BENCH_r03.json did.

Reference analogue: the harness owns its record end-to-end
(/root/reference/code/main.cpp:449-526, write_results.hpp:42-157).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BROKEN_SITE = os.path.join(REPO, "tests", "fixtures", "broken_tpu_site")


def _outage_env(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = BROKEN_SITE + os.pathsep + REPO
    # the broken sitecustomize force-pins over this, like real axon does
    env["JAX_PLATFORMS"] = "cpu"
    env["USPMV_TPU_INIT_ATTEMPTS"] = "2"
    env["USPMV_TPU_INIT_BACKOFF_S"] = "0.05"
    env["USPMV_OUTPUT_DIR"] = str(tmp_path)
    return env


def _run(args, env, timeout=240, cwd=REPO):
    return subprocess.run(
        args, env=env, cwd=cwd, timeout=timeout,
        capture_output=True, text=True,
    )


def test_simulated_outage_breaks_unpinned_device_query(tmp_path):
    """Sanity: the fixture really does poison a bare jax.devices()."""
    p = _run([sys.executable, "-c", "import jax; jax.devices()"],
             _outage_env(tmp_path))
    assert p.returncode != 0
    assert "UNAVAILABLE" in (p.stderr + p.stdout)


def test_cli_backend_cpu_completes_with_tunnel_down(tmp_path):
    p = _run(
        [sys.executable, "-m", "uspmv_tpu.cli",
         "Laplace2D,24", "scs", "-mode", "s", "-backend", "cpu",
         "-rev", "2", "-validate", "1", "-mtx_out", str(tmp_path)],
        _outage_env(tmp_path),
    )
    assert p.returncode == 0, p.stderr[-2000:]


def test_cli_backend_tpu_fails_clean_not_traceback(tmp_path):
    p = _run(
        [sys.executable, "-m", "uspmv_tpu.cli",
         "Laplace2D,24", "scs", "-mode", "b", "-backend", "tpu",
         "-mtx_out", str(tmp_path)],
        _outage_env(tmp_path),
    )
    assert p.returncode == 3, (p.returncode, p.stderr[-2000:])
    assert "ERROR: accelerator backend unavailable after 2 attempts" \
        in p.stderr
    assert "Traceback" not in p.stderr


def test_bench_py_emits_parseable_json_on_outage(tmp_path):
    p = _run([sys.executable, os.path.join(REPO, "bench.py")],
             _outage_env(tmp_path))
    assert p.returncode == 0, p.stderr[-2000:]
    line = p.stdout.strip().splitlines()[-1]
    rec = json.loads(line)  # the driver-parseable record
    assert rec["error"] == "tpu-unavailable"
    assert rec["value"] is None
    assert "metric" in rec and "vs_baseline" in rec


def test_devices_with_retry_hang_bounded(monkeypatch):
    """In-process: a HANGING backend init (the real axon outage mode —
    jax.devices() blocks forever in the plugin) is bounded by
    USPMV_TPU_INIT_TIMEOUT_S and surfaces as the typed error, not an
    eternal block."""
    import time

    monkeypatch.setenv("USPMV_TPU_INIT_TIMEOUT_S", "0.3")

    import uspmv_tpu.runtime.backend as be

    def hang_devices(platform=None):
        time.sleep(3600)

    import jax

    monkeypatch.setattr(jax, "devices", hang_devices)
    t0 = time.monotonic()
    with pytest.raises(be.BackendUnavailableError) as ei:
        be.devices_with_retry()
    assert time.monotonic() - t0 < 10
    assert "init hang" in str(ei.value)


def test_bench_py_emits_parseable_json_on_hang(tmp_path):
    """Subprocess: bench.py against a HANGING fake tunnel must emit the
    parseable record within the hang bound (this session reproduced the
    unbounded version eating a 600 s timeout)."""
    env = _outage_env(tmp_path)
    env["USPMV_FAKEAXON_HANG"] = "1"
    env["USPMV_TPU_INIT_TIMEOUT_S"] = "3"
    p = _run([sys.executable, os.path.join(REPO, "bench.py")],
             env, timeout=120)
    assert p.returncode == 0, p.stderr[-2000:]
    rec = json.loads(p.stdout.strip().splitlines()[-1])
    assert rec["error"] == "tpu-unavailable"
    assert "init hang" in rec["detail"]


def _load_bench_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # top level is pure defs, no jax import
    return mod


def test_watchdog_emits_partial_on_midrun_hang():
    """A tunnel that hangs AFTER backend init (observed live 2026-08-19:
    the headline block_until_ready blocked 30+ min) must still produce
    the driver's JSON record with everything measured so far."""
    import time

    bench = _load_bench_module()
    records, exits = [], []
    partial = {"metric": "m", "value": 185.3, "unit": "GFLOP/s",
               "vs_baseline": 1.29}
    bench.Watchdog(0.2, partial, records.append, _exit=exits.append)
    # a metric landing after arming but before the hang is reported
    partial["fem_tet3d_55_gflops"] = 118.4
    time.sleep(1.0)
    assert exits == [0]
    (rec,) = records
    assert rec["value"] == 185.3
    assert rec["fem_tet3d_55_gflops"] == 118.4
    assert rec["error"].startswith("tpu-hung-mid-run")


def test_watchdog_progress_rearms_phase_timer():
    """A healthy-but-slow run keeps making progress and must never fire,
    even when its TOTAL runtime exceeds the phase deadline."""
    import time

    bench = _load_bench_module()
    records, exits = [], []
    wd = bench.Watchdog(0.4, {"metric": "m"}, records.append,
                        _exit=exits.append)
    for _ in range(4):  # total 0.8 s > deadline; each phase 0.2 s < it
        time.sleep(0.2)
        wd.progress()
    wd.cancel()
    time.sleep(0.6)
    assert records == [] and exits == []


def test_watchdog_cancel_on_normal_completion():
    import time

    bench = _load_bench_module()
    records, exits = [], []
    wd = bench.Watchdog(0.2, {"metric": "m"}, records.append,
                        _exit=exits.append)
    wd.cancel()
    time.sleep(0.5)
    assert records == [] and exits == []


def test_devices_with_retry_bounded(tmp_path, monkeypatch):
    """In-process: retry budget respected and the error is typed."""
    monkeypatch.setenv("USPMV_TPU_INIT_ATTEMPTS", "3")
    monkeypatch.setenv("USPMV_TPU_INIT_BACKOFF_S", "0.01")
    calls = []

    import uspmv_tpu.runtime.backend as be

    def fake_devices(platform=None):
        calls.append(platform)
        raise RuntimeError("UNAVAILABLE: simulated")

    import jax

    monkeypatch.setattr(jax, "devices", fake_devices)
    with pytest.raises(be.BackendUnavailableError) as ei:
        be.devices_with_retry()
    assert len(calls) == 3
    assert "after 3 attempts" in str(ei.value)
    assert "UNAVAILABLE: simulated" in str(ei.value)
