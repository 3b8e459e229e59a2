"""Diagnose WHAT collapses cross-row hidden diversity in the MoE bench."""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from gptqmodel_tpu.ops import registry

registry.set_backend("xla")
os.environ["GPTQ_TPU_QMOE_E2E"] = "0"

from gptqmodel_tpu.models import transformer as _trm

_trm._QMOE_MAX_TOKENS = 0

import bench_moe
from scripts.routing_spread_cpu import spec_for


def diag(scale, layers=16, B=8, T=8):
    os.environ["BENCH_MOE_SCALE"] = str(scale)
    spec = spec_for(layers)
    params = bench_moe.build_params(spec)

    # capture hidden states entering each MoE dispatch
    captured = []
    orig = _trm._moe_stacked_dispatch

    def rec(spec_, mp_, x_, top_w_, top_i_):
        captured.append(np.asarray(x_, np.float32).reshape(B, T, -1))
        return orig(spec_, mp_, x_, top_w_, top_i_)

    _trm._moe_stacked_dispatch = rec
    try:
        rng = np.random.default_rng(7)
        ids = jnp.asarray(rng.integers(1, spec.vocab_size, size=(B, T)),
                          jnp.int32)
        _trm.forward_logits(spec, params, ids, dtype=jnp.bfloat16)
    finally:
        _trm._moe_stacked_dispatch = orig

    print(f"scale={scale}")
    for li in (0, 1, 2, 4, 8, 15):
        h = captured[li][:, 6, :]  # [B, D] at position 6
        hn = h / (np.linalg.norm(h, axis=1, keepdims=True) + 1e-9)
        cos = hn @ hn.T
        off = cos[~np.eye(B, dtype=bool)]
        # subtract the cross-row mean: how big is the common mode?
        mu = h.mean(0, keepdims=True)
        resid = np.linalg.norm(h - mu) / (np.linalg.norm(h) + 1e-9)
        print(f"  L{li:2d}: |h|rms={np.sqrt((h**2).mean()):.3e} "
              f"cross-row cos mean={off.mean():.3f} max={off.max():.3f} "
              f"resid-frac={resid:.3f}")


for s in (0.01, 0.0003):
    diag(s)
