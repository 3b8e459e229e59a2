"""CPU experiment: why does the synthetic MoE bench's routing collapse?

Hypothesis (VERDICT r4 #1): weight scale 0.01 makes each sub-layer output
~2x the (normalized) input at hidden=2048, so the residual stream is
dominated by accumulated layer noise instead of the per-token embedding —
deep-layer hidden states lose per-token diversity and all B rows route to
nearly the same expert set (13.2 unique of 128 measured on chip).

This sweeps the scale on a smaller-but-deep model (XLA path, CPU) and
reports mean unique experts per layer per step at several depths.
"""
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

_trm._QMOE_MAX_TOKENS = 0  # CPU: force the pure-XLA dense-fallback MoE path

import bench_moe
from gptqmodel_tpu.models.spec import ModelSpec


def spec_for(layers):
    return ModelSpec(
        model_type="qwen3_moe", vocab_size=4096, hidden_size=512,
        intermediate_size=1024, num_layers=layers, num_heads=8,
        num_kv_heads=2, head_dim=64, rope_theta=1e6,
        max_position_embeddings=4096, num_experts=128,
        num_experts_per_tok=8, moe_intermediate_size=192,
        norm_topk_prob=True,
    )


def probe(spec, scale, B=8, probe_T=8, seed=0):
    os.environ["BENCH_MOE_SCALE"] = str(scale)
    params = bench_moe.build_params(spec)
    from gptqmodel_tpu.models import transformer as _tr
    recorded = []
    orig = _tr._moe_stacked_dispatch

    def rec(spec_, mp_, x_, top_w_, top_i_):
        recorded.append(np.asarray(top_i_).reshape(B, probe_T, -1))
        return orig(spec_, mp_, x_, top_w_, top_i_)

    _tr._moe_stacked_dispatch = rec
    try:
        rng = np.random.default_rng(seed + 7)
        ids = jnp.asarray(
            rng.integers(1, spec.vocab_size, size=(B, probe_T)), jnp.int32)
        _tr.forward_logits(spec, params, ids, dtype=jnp.bfloat16)
    finally:
        _tr._moe_stacked_dispatch = orig
    per_layer = [
        np.mean([len(np.unique(ti[:, t]))
                 for t in range(probe_T // 2, probe_T)])
        for ti in recorded
    ]
    return per_layer


def main():
    iid = 128 * (1 - (1 - 1 / 128) ** 64)
    print(f"iid expectation: {iid:.1f}")
    for layers in (16,):
        spec = spec_for(layers)
        for scale in (0.01, 0.003, 0.001, 0.0003):
            pl = probe(spec, scale)
            print(f"L={layers} scale={scale}: mean_uniq={np.mean(pl):.1f} "
                  f"first4={['%.0f' % v for v in pl[:4]]} "
                  f"last4={['%.0f' % v for v in pl[-4:]]}", flush=True)


if __name__ == "__main__":
    main()
