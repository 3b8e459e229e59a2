"""Inference speed regression bands (reference tests/inference_speed.py:44
pattern: recorded number per kernel, assert within [-25%, +inf) band).

Runs ONLY on real TPU hardware (the CPU-mesh suite skips it) — the driver's
bench run is the usual source of these numbers; this test is the in-repo
guard when executed on-chip (e.g. via the verify skill).
"""

import os

import pytest

import jax

# recorded on v5e (BENCH_r01.json): llama-3-8B-shaped 4-bit decode, B=8, 32L
RECORDED_TOK_S = 1382.0
BAND_LOW = 0.9  # tighter than the reference's -25%: min-of-3 timing is stable


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


@pytest.mark.skipif(not _on_tpu(), reason="speed bands are recorded on TPU")
def test_decode_speed_band():
    import json
    import subprocess
    import sys

    env = dict(os.environ, BENCH_LAYERS="32", BENCH_BATCH="8")
    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        env=env, timeout=3600, check=True,
    )
    row = json.loads(out.stdout.strip().splitlines()[-1])
    assert row["value"] >= RECORDED_TOK_S * BAND_LOW, row
