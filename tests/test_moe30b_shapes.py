"""Qwen3-MoE-30B-scale validation (BASELINE config 4) — shape-only.

Validates per-expert quantization structure (module-tree expansion to 128
experts) and traces the routed-expert decode at real geometry via
eval_shape (no allocation).
"""

import jax
import jax.numpy as jnp

from gptqmodel_tpu.models.definitions import get_model_def
from gptqmodel_tpu.models.module_tree import parse_module_tree
from gptqmodel_tpu.models.spec import ModelSpec
from tests.test_70b_sharding import _abstract_ql


def qwen3_moe_30b_spec(layers=48):
    # Qwen3-30B-A3B geometry
    return ModelSpec(
        model_type="qwen3_moe", vocab_size=151936, hidden_size=2048,
        intermediate_size=6144, num_layers=layers, num_heads=32,
        num_kv_heads=4, head_dim=128, qk_norm=True,
        num_experts=128, num_experts_per_tok=8, moe_intermediate_size=768,
        norm_topk_prob=True, rope_theta=1000000.0,
    )


def test_module_tree_expands_128_experts():
    mdef = get_model_def("qwen3_moe")
    plan = parse_module_tree(list(mdef.module_tree))
    subsets = plan.build_subsets(num_experts=128)
    s0 = subsets[0]
    assert "mlp.experts.0.gate_proj" in s0
    assert "mlp.experts.127.up_proj" in s0
    assert sum(1 for p in s0 if p.startswith("mlp.experts.")) == 128 * 2
    assert "mlp.experts.127.down_proj" in subsets[1]


def test_moe30b_decode_traces_abstractly():
    from gptqmodel_tpu.inference.engine import make_decode_fn

    spec = qwen3_moe_30b_spec(layers=48)
    S = jax.ShapeDtypeStruct
    h = spec.hidden_size
    q = spec.num_heads * spec.head_dim
    kv = spec.num_kv_heads * spec.head_dim
    mi = spec.moe_intermediate_size

    def expert():
        return {
            "gate_proj": _abstract_ql(mi, h, g=128),
            "up_proj": _abstract_ql(mi, h, g=128),
            "down_proj": _abstract_ql(h, mi, g=128),
        }

    layer = {
        "input_layernorm": {"weight": S((h,), jnp.bfloat16)},
        "post_attention_layernorm": {"weight": S((h,), jnp.bfloat16)},
        "self_attn": {
            "q_norm": {"weight": S((spec.head_dim,), jnp.bfloat16)},
            "k_norm": {"weight": S((spec.head_dim,), jnp.bfloat16)},
            "q_proj": _abstract_ql(q, h), "k_proj": _abstract_ql(kv, h),
            "v_proj": _abstract_ql(kv, h), "o_proj": _abstract_ql(h, q),
        },
        "mlp": {
            "gate": {"weight": S((spec.num_experts, h), jnp.bfloat16)},
            "experts": [expert() for _ in range(spec.num_experts)],
        },
    }
    params = {
        "model": {
            "embed_tokens": {"weight": S((spec.vocab_size, h), jnp.bfloat16)},
            "layers": [dict(layer) for _ in range(spec.num_layers)],
            "norm": {"weight": S((h,), jnp.bfloat16)},
        },
        "lm_head": _abstract_ql(spec.vocab_size, h),
    }
    B, max_len = 4, 64
    caches = [
        {"pos": S((), jnp.int32),
         "k": S((B, spec.num_kv_heads, max_len, spec.head_dim), jnp.bfloat16),
         "v": S((B, spec.num_kv_heads, max_len, spec.head_dim), jnp.bfloat16)}
        for _ in range(spec.num_layers)
    ]
    decode = make_decode_fn(spec, jnp.bfloat16)
    logits, new_caches, _ = jax.eval_shape(
        decode, params, S((B,), jnp.int32), S((B,), jnp.int32),
        S((), jnp.int32), S((B, max_len), jnp.bool_), caches,
    )
    assert logits.shape == (B, spec.vocab_size)
    assert len(new_caches) == spec.num_layers
