"""Simulated down-TPU-tunnel environment (tests/test_backend_outage.py).

Mimics the axon plugin's two behaviors that made VERDICT r3 weak #1/#2
reproducible, but failing FAST instead of hanging so tests stay quick:

1. registers a high-priority accelerator backend factory whose init
   raises UNAVAILABLE (the real tunnel hangs or raises
   jax.errors.JaxRuntimeError UNAVAILABLE — see BENCH_r03.json);
2. force-pins ``jax_platforms`` to itself via jax.config, overriding any
   ``JAX_PLATFORMS`` env var — exactly what axon's register() does
   (tests/conftest.py:16-18 documents the quirk).

Any process in this environment that queries devices without first
pinning cpu via jax.config dies with UNAVAILABLE, like a CLI run during
a tunnel outage.
"""

import os

import jax
from jax._src import xla_bridge as xb


def _broken_factory(*args, **kwargs):
    if os.environ.get("USPMV_FAKEAXON_HANG"):
        # the REAL axon outage mode: init blocks forever (the 900 s
        # probes never return) — exercised by the hang-bound tests
        import time

        while True:
            time.sleep(3600)
    raise RuntimeError(
        "UNAVAILABLE: TPU backend setup/compile error "
        "(simulated tunnel outage)"
    )


xb.register_backend_factory(
    "fakeaxon", _broken_factory, priority=500, fail_quietly=False
)
jax.config.update("jax_platforms", "fakeaxon")
