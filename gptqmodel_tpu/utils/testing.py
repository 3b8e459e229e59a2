"""Random-model builders for tests/benchmarks (no checkpoint, no torch).

Builds llama-family params pytrees directly in numpy — dense or RTN-packed —
so kernels, sharding, and the inference engine can be exercised without any
network access (this environment has zero egress; real checkpoints are only
available in tests via transformers' random init + save_pretrained).
"""

from __future__ import annotations

import numpy as np

from gptqmodel_tpu.models.spec import ModelSpec
from gptqmodel_tpu.ops.qlinear import make_quant_linear
from gptqmodel_tpu.ops.registry import post_init_module
from gptqmodel_tpu.quantization.rtn import rtn_quantize


def tiny_spec(
    hidden=256, layers=2, heads=8, kv_heads=4, inter=512, vocab=512, **over
) -> ModelSpec:
    base = dict(
        model_type="llama",
        vocab_size=vocab,
        hidden_size=hidden,
        intermediate_size=inter,
        num_layers=layers,
        num_heads=heads,
        num_kv_heads=kv_heads,
        head_dim=hidden // heads,
        max_position_embeddings=2048,
    )
    base.update(over)
    return ModelSpec(**base)


def llama8b_spec(layers: int | None = None) -> ModelSpec:
    """Llama-3-8B shapes (BASELINE.json flagship config)."""
    return ModelSpec(
        model_type="llama",
        vocab_size=128256,
        hidden_size=4096,
        intermediate_size=14336,
        num_layers=layers if layers is not None else 32,
        num_heads=32,
        num_kv_heads=8,
        head_dim=128,
        rope_theta=500000.0,
        max_position_embeddings=8192,
    )


def random_dense_params(spec: ModelSpec, seed=0, scale=0.02, dtype=np.float32):
    rng = np.random.default_rng(seed)

    def lin(out_f, in_f):
        return {"weight": (rng.standard_normal((out_f, in_f)) * scale).astype(dtype)}

    h, q = spec.hidden_size, spec.num_heads * spec.head_dim
    kv = spec.num_kv_heads * spec.head_dim
    layers = []
    for _ in range(spec.num_layers):
        layers.append(
            {
                "input_layernorm": {"weight": np.ones(h, dtype)},
                "post_attention_layernorm": {"weight": np.ones(h, dtype)},
                "self_attn": {
                    "q_proj": lin(q, h),
                    "k_proj": lin(kv, h),
                    "v_proj": lin(kv, h),
                    "o_proj": lin(h, q),
                },
                "mlp": {
                    "gate_proj": lin(spec.intermediate_size, h),
                    "up_proj": lin(spec.intermediate_size, h),
                    "down_proj": lin(h, spec.intermediate_size),
                },
            }
        )
    return {
        "model": {
            "embed_tokens": {
                "weight": (rng.standard_normal((spec.vocab_size, h)) * scale).astype(dtype)
            },
            "layers": layers,
            "norm": {"weight": np.ones(h, dtype)},
        },
        "lm_head": lin(spec.vocab_size, h),
    }


def quantize_params_rtn(params, bits=4, group_size=128, post_init=True):
    """RTN-pack every attention/mlp linear (fast synthetic quantized model)."""
    from gptqmodel_tpu.models.transformer import get_by_path, set_by_path

    out = params
    paths = [
        "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
        "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj",
    ]
    for lp in out["model"]["layers"]:
        for p in paths:
            dense = get_by_path(lp, p)
            W = np.asarray(dense["weight"], np.float32)
            res = rtn_quantize(W, bits=bits, group_size=group_size, sym=True)
            qmod = make_quant_linear(
                Q=res.Q, scales=res.scales, zeros=res.zeros, g_idx=None,
                bias=None, bits=bits, group_size=group_size, sym=True,
            )
            if post_init:
                qmod = post_init_module(qmod)
            set_by_path(lp, p, qmod)
    return out
