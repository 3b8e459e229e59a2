"""Per-architecture model definitions (module trees + metadata).

TPU-native analog of the reference's 130 definition classes
(gptqmodel/models/definitions/): each arch is a small ModelDef record —
module tree in the shared DSL, lm_head/pre-head-norm names, expert-count
config field — not a class hierarchy. The functional forward in
``transformer.py`` is selected by ``ModelSpec`` flags, so most llama-lineage
archs share one entry shape. Unknown model_types fall back to the llama tree
(the reference's auto module-tree detection analog).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ModelDef:
    module_tree: tuple
    lm_head: str = "lm_head"
    pre_lm_head_norm: str = "model.norm"
    dynamic_expert_index: str | None = None  # HF config field w/ expert count
    require_dtype: str | None = None
    # per-method tree overrides, keyed by METHOD value string ("awq", ...)
    # (reference base.py:190 ``module_tree_overrides: dict[METHOD, tree]``)
    module_tree_overrides: tuple | None = None  # tuple of (method, tree) pairs
    # module-path suffixes whose DENSE weights are stored transposed
    # ([in, out] Conv1D, gpt2 lineage) — canonicalized to [out, in] at load
    # and transposed back on save (reference packs Conv1D via Q.t(),
    # gptq.py:1280)
    conv1d_suffixes: tuple = ()
    # expert count inferred from checkpoint tensor names (auto-detected
    # trees only; registered archs read dynamic_expert_index from config)
    detected_num_experts: int | None = None
    # optional CheckpointReader wrapper: (reader, hf_cfg) -> reader — lazy
    # tensor-name canonicalization for archs whose native layout differs
    # from the tree (dbrx fused experts)
    reader_wrapper: object = None

    def wrap_reader(self, reader, hf_cfg):
        return self.reader_wrapper(reader, hf_cfg) if self.reader_wrapper else reader

    @property
    def layers_container(self) -> str:
        """Dotted path of the decoder-layer list (tree prefix before "#"),
        e.g. "model.layers" — passed to build_params_tree so only THIS
        indexed stack streams as layers (VL vision towers have their own)."""
        parts = []
        for el in self.module_tree:
            if el == "#":
                break
            parts.append(el)
        return ".".join(parts)

    def tree_for(self, method) -> tuple:
        """Resolve the module tree for a quant method (override or default)."""
        if self.module_tree_overrides:
            for m, tree in self.module_tree_overrides:
                if str(m) == str(method):
                    return tree
        return self.module_tree


_LLAMA_TREE = (
    "model",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "mlp": ("gate_proj:0", "up_proj:0", "down_proj:1"),
    },
)

_QWEN3_TREE = (
    "model",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": ("q_norm:!", "k_norm:!", "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "mlp": ("gate_proj:0", "up_proj:0", "down_proj:1"),
    },
)

_QWEN3_MOE_TREE = (
    "model",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": ("q_norm:!", "k_norm:!", "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "mlp:moe:?": {
            "gate": ("gate:!",),
            "experts": {"#": ("gate_proj:0", "up_proj:0", "down_proj:1")},
        },
    },
)

_GEMMA2_TREE = (
    "model",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "pre_feedforward_layernorm": ("pre_feedforward_layernorm:!",),
        "post_feedforward_layernorm": ("post_feedforward_layernorm:!",),
        "mlp": ("gate_proj:0", "up_proj:0", "down_proj:1"),
    },
)

_QWEN2_MOE_TREE = (
    "model",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "mlp:moe:?": {
            "gate": ("gate:!",),
            "experts": {"#": ("gate_proj:0", "up_proj:0", "down_proj:1")},
            "shared_expert": ("gate_proj:0", "up_proj:0", "down_proj:1"),
            "shared_expert_gate": ("shared_expert_gate:!",),
        },
    },
)

_MIXTRAL_TREE = (
    "model",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "block_sparse_moe": {
            "gate": ("gate:!",),
            "experts": {"#": ("w1:0", "w3:0", "w2:1")},
        },
    },
)

_PHI3_TREE = (
    "model",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": ("qkv_proj:0", "o_proj:1"),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "mlp": ("gate_up_proj:0", "down_proj:1"),
    },
)

_OPT_TREE = (
    "model",
    "decoder",
    "layers",
    "#",
    {
        "self_attn_layer_norm": ("self_attn_layer_norm:!",),
        "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "out_proj:1"),
        "final_layer_norm": ("final_layer_norm:!",),
        "fc1": ("fc1:0",),
        "fc2": ("fc2:1",),
    },
)

# deepseek v2/v3 (reference definitions/deepseek_v2.py): lite has q_proj,
# full has q_a/q_b; first_k_dense_replace layers carry a plain mlp (the ""
# entries), later layers experts + shared_experts — absent modules skip.
_DEEPSEEK_TREE = (
    "model",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": (
            "q_a_proj:0", "q_b_proj:0", "q_proj:0",
            "kv_a_proj_with_mqa:0", "kv_b_proj:0", "o_proj:1",
        ),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "mlp:moe": {
            "": ("gate_proj:0", "up_proj:0", "down_proj:1"),
            "experts": {"#": ("gate_proj:0", "up_proj:0", "down_proj:1")},
            "shared_experts": ("gate_proj:0", "up_proj:0", "down_proj:1"),
        },
    },
)

_GEMMA3_TREE = (
    "model",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": (
            "q_norm:!", "k_norm:!",
            "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
        ),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "pre_feedforward_layernorm": ("pre_feedforward_layernorm:!",),
        "post_feedforward_layernorm": ("post_feedforward_layernorm:!",),
        "mlp": ("gate_proj:0", "up_proj:0", "down_proj:1"),
    },
)

_GPT2_TREE = (
    "transformer",
    "h",
    "#",
    {
        "ln_1": ("ln_1:!",),
        "attn": ("c_attn:0", "c_proj:1"),
        "ln_2": ("ln_2:!",),
        "mlp": ("c_fc:0", "c_proj:1"),
    },
)

_BLOOM_TREE = (
    "transformer",
    "h",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attention": ("query_key_value:0", "dense:1"),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "mlp": ("dense_h_to_4h:0", "dense_4h_to_h:1"),
    },
)

_GPT_NEOX_TREE = (
    "gpt_neox",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "attention": ("query_key_value:0", "dense:1"),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "mlp": ("dense_h_to_4h:0", "dense_4h_to_h:1"),
    },
)

_GPTJ_TREE = (
    "transformer",
    "h",
    "#",
    {
        "ln_1": ("ln_1:!",),
        "attn": ("q_proj:0", "k_proj:0", "v_proj:0", "out_proj:1"),
        "mlp": ("fc_in:0", "fc_out:1"),
    },
)

# falcon layer-norm naming varies by generation (input_layernorm for 7b/rw,
# ln_attn/ln_mlp for new-arch 40b/180b); absent modules skip.
_FALCON_TREE = (
    "transformer",
    "h",
    "#",
    {
        "input_layernorm:?": ("input_layernorm:!",),
        "ln_attn:?": ("ln_attn:!",),
        "ln_mlp:?": ("ln_mlp:!",),
        "post_attention_layernorm:?": ("post_attention_layernorm:!",),
        "self_attention": ("query_key_value:0", "dense:1"),
        "mlp": ("dense_h_to_4h:0", "dense_4h_to_h:1"),
    },
)

_PHI_TREE = (
    "model",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "dense:1"),
        "mlp": ("fc1:0", "fc2:1"),
    },
)

_STABLELM_TREE = (
    "model",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "mlp": ("gate_proj:0", "up_proj:0", "down_proj:1"),
    },
)

_COHERE_TREE = (
    # parallel residual: attn and mlp share input_layernorm, so qkv and
    # gate/up all belong to subset 0 (true-sequential grouping)
    "model",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": (
            "q_norm:!", "k_norm:!",  # only present with use_qk_norm
            "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
        ),
        "mlp": ("gate_proj:0", "up_proj:0", "down_proj:1"),
    },
)

_OLMO2_TREE = (
    # post-only norms (no input_layernorm); full-width q/k norms
    "model",
    "layers",
    "#",
    {
        "self_attn": (
            "q_norm:!", "k_norm:!",
            "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
        ),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "mlp": ("gate_proj:0", "up_proj:0", "down_proj:1"),
        "post_feedforward_layernorm": ("post_feedforward_layernorm:!",),
    },
)

_OLMOE_TREE = (
    "model",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": (
            "q_norm:!", "k_norm:!",
            "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
        ),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "mlp": {
            "gate": ("gate:!",),
            "experts": {"#": ("gate_proj:0", "up_proj:0", "down_proj:1")},
        },
    },
)

_STARCODER2_TREE = (
    "model",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "mlp": ("c_fc:0", "c_proj:1"),
    },
)

_EXAONE4_TREE = (
    "model",
    "layers",
    "#",
    {
        "self_attn": (
            "q_norm:!", "k_norm:!",
            "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
        ),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "mlp": ("gate_proj:0", "up_proj:0", "down_proj:1"),
        "post_feedforward_layernorm": ("post_feedforward_layernorm:!",),
    },
)

_GLM_TREE = (
    "model",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "mlp": ("gate_up_proj:0", "down_proj:1"),
    },
)

_GLM4_TREE = (
    "model",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
        "post_self_attn_layernorm": ("post_self_attn_layernorm:!",),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "mlp": ("gate_up_proj:0", "down_proj:1"),
        "post_mlp_layernorm": ("post_mlp_layernorm:!",),
    },
)

_GLM4_MOE_TREE = (
    # deepseek-v3-style MoE body: dense first_k layers use plain mlp,
    # MoE layers use gate(+bias) / routed experts / shared_experts
    "model",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": (
            "q_norm:!", "k_norm:!",
            "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
        ),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "mlp": {
            "": ("gate_proj:0", "up_proj:0", "down_proj:1"),
            "gate": ("gate:!",),
            "experts": {"#": ("gate_proj:0", "up_proj:0", "down_proj:1")},
            "shared_experts": ("gate_proj:0", "up_proj:0", "down_proj:1"),
        },
    },
)

_BIGCODE_TREE = (
    "transformer",
    "h",
    "#",
    {
        "ln_1": ("ln_1:!",),
        "attn": ("c_attn:0", "c_proj:1"),
        "ln_2": ("ln_2:!",),
        "mlp": ("c_fc:0", "c_proj:1"),
    },
)

_ERNIE_MOE_TREE = (
    "model",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "mlp": {
            "": ("gate_proj:0", "up_proj:0", "down_proj:1"),
            "gate": ("gate:!",),
            "experts": {"#": ("gate_proj:0", "up_proj:0", "down_proj:1")},
            "shared_experts": ("gate_proj:0", "up_proj:0", "down_proj:1"),
        },
    },
)

_NEMOTRON_TREE = (
    "model",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "mlp": ("up_proj:0", "down_proj:1"),
    },
)

_HUNYUAN_TREE = (
    "model",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": (
            "query_layernorm:!", "key_layernorm:!",
            "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
        ),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "mlp": ("gate_proj:0", "up_proj:0", "down_proj:1"),
    },
)

# apertus (modeling_apertus.py:262-270): attention_layernorm /
# feedforward_layernorm norm names, per-head q/k RMSNorm, non-gated xIELU
# MLP (act params under mlp.act_fn are runtime-only, not quantized)
_APERTUS_TREE = (
    "model",
    "layers",
    "#",
    {
        "attention_layernorm": ("attention_layernorm:!",),
        "self_attn": (
            "q_norm:!", "k_norm:!",
            "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
        ),
        "feedforward_layernorm": ("feedforward_layernorm:!",),
        "mlp": ("up_proj:0", "down_proj:1"),
    },
)

# bitnet (modeling_bitnet.py:74,178): llama body + attn_sub_norm before
# o_proj and ffn_sub_norm before down_proj
_BITNET_TREE = (
    "model",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": (
            "attn_sub_norm:!",
            "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
        ),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "mlp": ("ffn_sub_norm:!", "gate_proj:0", "up_proj:0", "down_proj:1"),
    },
)

_PERSIMMON_TREE = (
    "model",
    "layers",
    "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": ("query_key_value:0", "dense:1"),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "mlp": ("dense_h_to_4h:0", "dense_4h_to_h:1"),
    },
)

REGISTRY: dict[str, ModelDef] = {
    "llama": ModelDef(_LLAMA_TREE),
    "mistral": ModelDef(_LLAMA_TREE),
    "qwen2": ModelDef(_LLAMA_TREE),
    "granite": ModelDef(_LLAMA_TREE),
    "smollm3": ModelDef(_LLAMA_TREE),
    "starcoder2": ModelDef(_STARCODER2_TREE),
    "internlm2": ModelDef(
        (
            "model",
            "layers",
            "#",
            {
                "input_layernorm": ("input_layernorm:!",),
                "self_attn": ("qkv_proj:0", "o_proj:1"),
                "post_attention_layernorm": ("post_attention_layernorm:!",),
                "mlp": ("gate_proj:0", "up_proj:0", "down_proj:1"),
            },
        ),
        reader_wrapper=__import__(
            "gptqmodel_tpu.models.remap", fromlist=["wrap_internlm2_reader"]
        ).wrap_internlm2_reader,
    ),
    "baichuan": ModelDef(
        (
            "model",
            "layers",
            "#",
            {
                "input_layernorm": ("input_layernorm:!",),
                "self_attn": ("qkv_proj:0", "o_proj:1"),
                "post_attention_layernorm": ("post_attention_layernorm:!",),
                "mlp": ("gate_proj:0", "up_proj:0", "down_proj:1"),
            },
        ),
        reader_wrapper=__import__(
            "gptqmodel_tpu.models.remap", fromlist=["wrap_baichuan_reader"]
        ).wrap_baichuan_reader,
    ),
    "minicpm": ModelDef(_LLAMA_TREE),
    "diffllama": ModelDef(_LLAMA_TREE),
    "xverse": ModelDef(_LLAMA_TREE),
    "mimo": ModelDef(_LLAMA_TREE),
    "exaone": ModelDef(
        _LLAMA_TREE,
        reader_wrapper=__import__(
            "gptqmodel_tpu.models.remap", fromlist=["wrap_exaone_reader"]
        ).wrap_exaone_reader,
    ),
    "minicpm3": ModelDef(
        (
            "model",
            "layers",
            "#",
            {
                "input_layernorm": ("input_layernorm:!",),
                "self_attn": (
                    "q_a_proj:0", "kv_a_proj_with_mqa:0",
                    "q_b_proj:1", "kv_b_proj:1", "o_proj:2",
                ),
                "post_attention_layernorm": ("post_attention_layernorm:!",),
                "mlp": ("gate_proj:0", "up_proj:0", "down_proj:1"),
            },
        ),
    ),
    # VL families: quantize the text tower (reference definitions/
    # base_qwen2_vl.py, llava.py — modality IMAGE quantizes language
    # layers); vision tower + projector stay dense and re-export verbatim
    "llava": ModelDef(
        _LLAMA_TREE,
        reader_wrapper=__import__(
            "gptqmodel_tpu.models.remap", fromlist=["wrap_vl_reader"]
        ).wrap_vl_reader,
    ),
    "qwen2_vl": ModelDef(
        _LLAMA_TREE,
        reader_wrapper=__import__(
            "gptqmodel_tpu.models.remap", fromlist=["wrap_vl_reader"]
        ).wrap_vl_reader,
    ),
    "qwen2_5_vl": ModelDef(
        _LLAMA_TREE,
        reader_wrapper=__import__(
            "gptqmodel_tpu.models.remap", fromlist=["wrap_vl_reader"]
        ).wrap_vl_reader,
    ),
    "llava_onevision": ModelDef(
        _LLAMA_TREE,
        reader_wrapper=__import__(
            "gptqmodel_tpu.models.remap", fromlist=["wrap_vl_reader"]
        ).wrap_vl_reader,
    ),
    "mistral3": ModelDef(
        _LLAMA_TREE,
        reader_wrapper=__import__(
            "gptqmodel_tpu.models.remap", fromlist=["wrap_vl_reader"]
        ).wrap_vl_reader,
    ),
    "qwen3_vl": ModelDef(
        _QWEN3_TREE,
        reader_wrapper=__import__(
            "gptqmodel_tpu.models.remap", fromlist=["wrap_vl_reader"]
        ).wrap_vl_reader,
    ),
    "qwen3_vl_moe": ModelDef(
        _QWEN3_MOE_TREE,
        dynamic_expert_index="text_config.num_experts",
        reader_wrapper=__import__(
            "gptqmodel_tpu.models.remap", fromlist=["wrap_vl_reader"]
        ).wrap_vl_reader,
    ),
    "glm4v": ModelDef(
        _GLM4_TREE,
        reader_wrapper=__import__(
            "gptqmodel_tpu.models.remap", fromlist=["wrap_vl_reader"]
        ).wrap_vl_reader,
    ),
    "glm4v_moe": ModelDef(
        _GLM4_MOE_TREE,
        dynamic_expert_index="text_config.n_routed_experts",
        reader_wrapper=__import__(
            "gptqmodel_tpu.models.remap", fromlist=["wrap_vl_reader"]
        ).wrap_vl_reader,
    ),
    "gpt_oss": ModelDef(
        (
            "model",
            "layers",
            "#",
            {
                "input_layernorm": ("input_layernorm:!",),
                "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
                "post_attention_layernorm": ("post_attention_layernorm:!",),
                "mlp": {
                    "gate": ("gate:!",),
                    "experts": {"#": ("gate_proj:0", "up_proj:0", "down_proj:1")},
                },
            },
        ),
        dynamic_expert_index="num_local_experts",
        reader_wrapper=__import__(
            "gptqmodel_tpu.models.remap", fromlist=["wrap_gpt_oss_reader"]
        ).wrap_gpt_oss_reader,
    ),
    "cohere": ModelDef(_COHERE_TREE),
    "cohere2": ModelDef(_COHERE_TREE),
    "olmo": ModelDef(_LLAMA_TREE),
    "olmo2": ModelDef(_OLMO2_TREE),
    "olmo3": ModelDef(_OLMO2_TREE),
    "olmoe": ModelDef(_OLMOE_TREE, dynamic_expert_index="num_experts"),
    "flex_olmo": ModelDef(
        (
            "model",
            "layers",
            "#",
            {
                "self_attn": (
                    "q_norm:!", "k_norm:!",
                    "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
                ),
                "post_attention_layernorm": ("post_attention_layernorm:!",),
                "mlp": {
                    "gate": ("gate:!",),
                    "experts": {"#": ("gate_proj:0", "up_proj:0", "down_proj:1")},
                },
                "post_feedforward_layernorm": ("post_feedforward_layernorm:!",),
            },
        ),
        dynamic_expert_index="num_experts",
    ),
    "ministral": ModelDef(_LLAMA_TREE),
    "code_llama": ModelDef(_LLAMA_TREE),
    "vaultgemma": ModelDef(
        (
            "model",
            "layers",
            "#",
            {
                "input_layernorm": ("input_layernorm:!",),
                "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
                "pre_feedforward_layernorm": ("pre_feedforward_layernorm:!",),
                "mlp": ("gate_proj:0", "up_proj:0", "down_proj:1"),
            },
        ),
    ),
    "granitemoeshared": ModelDef(
        (
            "model",
            "layers",
            "#",
            {
                "input_layernorm": ("input_layernorm:!",),
                "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
                "post_attention_layernorm": ("post_attention_layernorm:!",),
                "block_sparse_moe": {
                    "gate": ("gate:!",),
                    "experts": {"#": ("gate_proj:0", "up_proj:0", "down_proj:1")},
                },
                "shared_mlp": ("gate_up_proj:0", "down_proj:1"),
            },
        ),
        dynamic_expert_index="num_local_experts",
        reader_wrapper=__import__(
            "gptqmodel_tpu.models.remap", fromlist=["wrap_granitemoe_reader"]
        ).wrap_granitemoe_reader,
    ),
    "exaone4": ModelDef(_EXAONE4_TREE),
    "glm": ModelDef(_GLM_TREE),
    "glm4": ModelDef(_GLM4_TREE),
    "glm4_moe": ModelDef(
        _GLM4_MOE_TREE, dynamic_expert_index="n_routed_experts"
    ),
    "gpt_bigcode": ModelDef(_BIGCODE_TREE, pre_lm_head_norm="transformer.ln_f"),
    "ernie4_5": ModelDef(_LLAMA_TREE),
    "ernie4_5_moe": ModelDef(
        _ERNIE_MOE_TREE, dynamic_expert_index="moe_num_experts"
    ),
    "helium": ModelDef(_LLAMA_TREE),
    "seed_oss": ModelDef(_LLAMA_TREE),
    "arcee": ModelDef(_NEMOTRON_TREE),
    "apertus": ModelDef(_APERTUS_TREE),
    "bitnet": ModelDef(_BITNET_TREE),
    "nemotron": ModelDef(_NEMOTRON_TREE),
    "hunyuan_v1_dense": ModelDef(_HUNYUAN_TREE),
    "hunyuan_v1_moe": ModelDef(
        (
            "model",
            "layers",
            "#",
            {
                "input_layernorm": ("input_layernorm:!",),
                "self_attn": (
                    "query_layernorm:!", "key_layernorm:!",
                    "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
                ),
                "post_attention_layernorm": ("post_attention_layernorm:!",),
                "mlp": {
                    "gate": ("wg:!",),
                    "experts": {"#": ("gate_proj:0", "up_proj:0", "down_proj:1")},
                    "shared_mlp": ("gate_proj:0", "up_proj:0", "down_proj:1"),
                },
            },
        ),
        dynamic_expert_index="num_experts",
    ),
    "dots1": ModelDef(_GLM4_MOE_TREE, dynamic_expert_index="n_routed_experts"),
    "persimmon": ModelDef(
        _PERSIMMON_TREE, pre_lm_head_norm="model.final_layernorm"
    ),
    "mpt": ModelDef(
        (
            "transformer",
            "blocks",
            "#",
            {
                "norm_1": ("norm_1:!",),
                "attn": ("Wqkv:0", "out_proj:1"),
                "norm_2": ("norm_2:!",),
                "ffn": ("up_proj:0", "down_proj:1"),
            },
        ),
        pre_lm_head_norm="transformer.norm_f",
    ),
    "phi3": ModelDef(_PHI3_TREE),
    "phi4": ModelDef(_PHI3_TREE),
    "opt": ModelDef(
        _OPT_TREE,
        pre_lm_head_norm="model.decoder.final_layer_norm",
    ),
    "qwen3": ModelDef(_QWEN3_TREE),
    "qwen3_next": ModelDef(
        (
            "model",
            "layers",
            "#",
            {
                "input_layernorm": ("input_layernorm:!",),
                "self_attn": (
                    "q_norm:!", "k_norm:!",
                    "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
                ),
                "linear_attn": (
                    "norm:!", "in_proj_qkvz:0", "in_proj_ba:0", "out_proj:1",
                ),
                "post_attention_layernorm": ("post_attention_layernorm:!",),
                "mlp:moe:?": {
                    "": ("gate_proj:0", "up_proj:0", "down_proj:1"),
                    "gate": ("gate:!",),
                    "experts": {"#": ("gate_proj:0", "up_proj:0", "down_proj:1")},
                    "shared_expert": ("gate_proj:0", "up_proj:0", "down_proj:1"),
                    "shared_expert_gate": ("shared_expert_gate:!",),
                },
            },
        ),
        dynamic_expert_index="num_experts",
    ),
    "qwen3_moe": ModelDef(_QWEN3_MOE_TREE, dynamic_expert_index="num_experts"),
    "qwen2_moe": ModelDef(_QWEN2_MOE_TREE, dynamic_expert_index="num_experts"),
    "mixtral": ModelDef(_MIXTRAL_TREE, dynamic_expert_index="num_local_experts"),
    "longcat_flash": ModelDef(
        (
            "model",
            "layers",
            "#",
            {
                "self_attn": {
                    "0": ("q_a_proj:0", "q_b_proj:0", "q_proj:0",
                          "kv_a_proj_with_mqa:0", "kv_b_proj:0", "o_proj:1"),
                    "1": ("q_a_proj:2", "q_b_proj:2", "q_proj:2",
                          "kv_a_proj_with_mqa:2", "kv_b_proj:2", "o_proj:3"),
                },
                "mlps": {
                    "0": ("gate_proj:1", "up_proj:1", "down_proj:2"),
                    "1": ("gate_proj:3", "up_proj:3", "down_proj:4"),
                },
                "mlp": {
                    "router": ("router:!",),
                    "experts": {"#": ("gate_proj:1", "up_proj:1", "down_proj:2")},
                },
            },
        ),
        dynamic_expert_index="n_routed_experts",
    ),
    "minimax": ModelDef(
        (
            "model",
            "layers",
            "#",
            {
                "input_layernorm": ("input_layernorm:!",),
                # full-attention layers: q/k/v/o; lightning layers:
                # qkv_proj/output_gate/out_proj + full-width norm — absent
                # leaves skip per layer kind
                "self_attn": (
                    "norm:!",
                    "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
                    "qkv_proj:0", "output_gate:0", "out_proj:1",
                ),
                "post_attention_layernorm": ("post_attention_layernorm:!",),
                "block_sparse_moe": {
                    "gate": ("gate:!",),
                    "experts": {"#": ("w1:0", "w3:0", "w2:1")},
                },
            },
        ),
        dynamic_expert_index="num_local_experts",
    ),
    "phimoe": ModelDef(_MIXTRAL_TREE, dynamic_expert_index="num_local_experts"),
    "dbrx": ModelDef(
        (
            "model",
            "layers",
            "#",
            {
                "input_layernorm": ("input_layernorm:!",),
                "self_attn": ("qkv_proj:0", "o_proj:1"),
                "post_attention_layernorm": ("post_attention_layernorm:!",),
                "block_sparse_moe": {
                    "gate": ("gate:!",),
                    "experts": {"#": ("w1:0", "w3:0", "w2:1")},
                },
            },
        ),
        dynamic_expert_index="ffn_config.moe_num_experts",
        reader_wrapper=__import__(
            "gptqmodel_tpu.models.dbrx", fromlist=["wrap_dbrx_reader"]
        ).wrap_dbrx_reader,
    ),
    "gemma": ModelDef(_LLAMA_TREE),
    "gemma2": ModelDef(_GEMMA2_TREE),
    "gemma3_text": ModelDef(_GEMMA3_TREE),
    "gemma3": ModelDef(_GEMMA3_TREE),
    "gpt2": ModelDef(
        _GPT2_TREE,
        pre_lm_head_norm="transformer.ln_f",
        conv1d_suffixes=("attn.c_attn", "attn.c_proj", "mlp.c_fc", "mlp.c_proj"),
    ),
    "bloom": ModelDef(_BLOOM_TREE, pre_lm_head_norm="transformer.ln_f"),
    "deepseek_v2": ModelDef(_DEEPSEEK_TREE, dynamic_expert_index="n_routed_experts"),
    "deepseek_v3": ModelDef(_DEEPSEEK_TREE, dynamic_expert_index="n_routed_experts"),
    "gpt_neox": ModelDef(
        _GPT_NEOX_TREE,
        lm_head="embed_out",
        pre_lm_head_norm="gpt_neox.final_layer_norm",
    ),
    "gptj": ModelDef(_GPTJ_TREE, pre_lm_head_norm="transformer.ln_f"),
    "codegen": ModelDef(
        _GPTJ_TREE,
        pre_lm_head_norm="transformer.ln_f",
        reader_wrapper=__import__(
            "gptqmodel_tpu.models.remap", fromlist=["wrap_codegen_reader"]
        ).wrap_codegen_reader,
    ),
    "gpt_neo": ModelDef(
        (
            "transformer",
            "h",
            "#",
            {
                "ln_1": ("ln_1:!",),
                "attn": {
                    "attention": (
                        "q_proj:0", "k_proj:0", "v_proj:0", "out_proj:1",
                    ),
                },
                "ln_2": ("ln_2:!",),
                "mlp": ("c_fc:0", "c_proj:1"),
            },
        ),
        pre_lm_head_norm="transformer.ln_f",
    ),
    "falcon": ModelDef(_FALCON_TREE, pre_lm_head_norm="transformer.ln_f"),
    "phi": ModelDef(_PHI_TREE, pre_lm_head_norm="model.final_layernorm"),
    # mamba lineage (reference definitions/falcon_mamba.py:14): dt_proj is
    # intentionally NOT quantized there; we match
    "falcon_mamba": ModelDef(
        (
            "backbone",
            "layers",
            "#",
            {
                "norm": ("norm:!",),
                "mixer": ("in_proj:0", "x_proj:0", "out_proj:1"),
            },
        ),
        pre_lm_head_norm="backbone.norm_f",
    ),
    "mamba": ModelDef(
        (
            "backbone",
            "layers",
            "#",
            {
                "norm": ("norm:!",),
                "mixer": ("in_proj:0", "x_proj:0", "out_proj:1"),
            },
        ),
        pre_lm_head_norm="backbone.norm_f",
    ),
    "jamba": ModelDef(
        (
            "model",
            "layers",
            "#",
            {
                "input_layernorm": ("input_layernorm:!",),
                "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
                "mamba": ("in_proj:0", "x_proj:0", "out_proj:1"),
                "pre_ff_layernorm": ("pre_ff_layernorm:!",),
                "feed_forward": {
                    "": ("gate_proj:0", "up_proj:0", "down_proj:1"),
                    "router": ("router:!",),
                    "experts": {"#": ("gate_proj:0", "up_proj:0", "down_proj:1")},
                },
            },
        ),
        dynamic_expert_index="num_experts",
    ),
    "granitemoe": ModelDef(
        (
            "model",
            "layers",
            "#",
            {
                "input_layernorm": ("input_layernorm:!",),
                "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
                "post_attention_layernorm": ("post_attention_layernorm:!",),
                "block_sparse_moe": {
                    "gate": ("gate:!",),
                    "experts": {"#": ("gate_proj:0", "up_proj:0", "down_proj:1")},
                },
            },
        ),
        dynamic_expert_index="num_local_experts",
        reader_wrapper=__import__(
            "gptqmodel_tpu.models.remap", fromlist=["wrap_granitemoe_reader"]
        ).wrap_granitemoe_reader,
    ),
    "granitemoehybrid": ModelDef(
        (
            "model",
            "layers",
            "#",
            {
                "input_layernorm": ("input_layernorm:!",),
                "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
                "mamba": ("in_proj:0", "out_proj:1"),
                "post_attention_layernorm": ("post_attention_layernorm:!",),
                "block_sparse_moe": {
                    "gate": ("gate:!",),
                    "experts": {"#": ("gate_proj:0", "up_proj:0", "down_proj:1")},
                },
                "shared_mlp": ("gate_up_proj:0", "down_proj:1"),
            },
        ),
        dynamic_expert_index="num_local_experts",
        reader_wrapper=__import__(
            "gptqmodel_tpu.models.remap", fromlist=["wrap_granitemoe_reader"]
        ).wrap_granitemoe_reader,
    ),
    "lfm2": ModelDef(
        (
            "model",
            "layers",
            "#",
            {
                "operator_norm": ("operator_norm:!",),
                "self_attn": (
                    "q_layernorm:!", "k_layernorm:!",
                    "q_proj:0", "k_proj:0", "v_proj:0", "out_proj:1",
                ),
                "conv": ("in_proj:0", "out_proj:1"),
                "ffn_norm": ("ffn_norm:!",),
                "feed_forward": ("w1:0", "w3:0", "w2:1"),
            },
        ),
        pre_lm_head_norm="model.embedding_norm",
    ),
    "llama4": ModelDef(
        (
            "model",
            "layers",
            "#",
            {
                "input_layernorm": ("input_layernorm:!",),
                "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
                "post_attention_layernorm": ("post_attention_layernorm:!",),
                "feed_forward": {
                    "": ("gate_proj:0", "up_proj:0", "down_proj:1"),
                    "gate": ("gate:!",),
                    "experts": {"#": ("gate_proj:0", "up_proj:0", "down_proj:1")},
                    "shared_expert": ("gate_proj:0", "up_proj:0", "down_proj:1"),
                },
            },
        ),
        dynamic_expert_index="num_local_experts",
        reader_wrapper=__import__(
            "gptqmodel_tpu.models.remap", fromlist=["wrap_llama4_reader"]
        ).wrap_llama4_reader,
    ),
    "bamba": ModelDef(
        (
            "model",
            "layers",
            "#",
            {
                "input_layernorm": ("input_layernorm:!",),
                "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
                "mamba": ("in_proj:0", "out_proj:1"),
                "pre_ff_layernorm": ("pre_ff_layernorm:!",),
                "feed_forward": ("gate_proj:0", "up_proj:0", "down_proj:1"),
            },
        ),
        pre_lm_head_norm="model.final_layernorm",
    ),
    "falcon_h1": ModelDef(
        (
            "model",
            "layers",
            "#",
            {
                "input_layernorm": ("input_layernorm:!",),
                "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
                "mamba": ("norm:!", "in_proj:0", "out_proj:1"),
                "pre_ff_layernorm": ("pre_ff_layernorm:!",),
                "feed_forward": ("gate_proj:0", "up_proj:0", "down_proj:1"),
            },
        ),
        pre_lm_head_norm="model.final_layernorm",
    ),
    "mamba2": ModelDef(
        (
            "backbone",
            "layers",
            "#",
            {
                "norm": ("norm:!",),
                "mixer": ("in_proj:0", "out_proj:1"),
            },
        ),
        pre_lm_head_norm="backbone.norm_f",
    ),
    "stablelm": ModelDef(_STABLELM_TREE, pre_lm_head_norm="model.norm"),
}


REGISTRY["llama4_text"] = REGISTRY["llama4"]
REGISTRY["lfm2_vl"] = ModelDef(
    REGISTRY["lfm2"].module_tree,
    pre_lm_head_norm="model.embedding_norm",
    reader_wrapper=__import__(
        "gptqmodel_tpu.models.remap", fromlist=["wrap_vl_reader"]
    ).wrap_vl_reader,
)

# ---------------------------------------------------------------------------
# Alias archs — llama-body clones under other model_type strings (reference
# auto.py MODEL_MAP maps these onto LlamaQModel/Qwen3QModel/DeepSeekV3QModel
# etc.; spec.py._SPEC_ALIASES gives them the matching forward semantics).
for _alias, _src in {
    "yi": "llama",  # auto.py "100% llama clone"
    "stablelm_epoch": "llama",
    "longllama": "llama",
    "instella": "llama",
    "mobilellm": "llama",
    "dream": "llama",  # diffusion LM over a qwen2 body (definitions/dream.py)
    "deci": "llama",  # decilm/nemotron-nas variable-GQA NAS (definitions/decilm.py)
    "nemotron-nas": "llama",
    "ministral3": "llama",  # definitions/ministral3.py — plain llama tree
    "llava_qwen2": "llama",  # definitions/llava_qwen2.py — canonical model.*
    "marin": "qwen3",  # auto.py maps marin -> Qwen3QModel
    "kimi_k2": "deepseek_v3",  # auto.py "100% DeepSeekV3QModel clone"
    "telechat": "llama",  # telechat2 llama-shaped body (definitions/telechat2.py)
}.items():
    REGISTRY[_alias] = REGISTRY[_src]

_VL_WRAP = __import__(
    "gptqmodel_tpu.models.remap", fromlist=["wrap_vl_reader"]
).wrap_vl_reader

# VL / audio text-tower archs: quantize the language tower; the vision or
# audio tower + projector stay dense and re-export verbatim. wrap_vl_reader
# canonicalizes {model.language_model | language_model.model | llm.model |
# language.model | thinker.model}.* -> model.*.
REGISTRY["voxtral"] = ModelDef(_LLAMA_TREE, reader_wrapper=_VL_WRAP)
REGISTRY["glm_ocr"] = ModelDef(_LLAMA_TREE, reader_wrapper=_VL_WRAP)
REGISTRY["glmasr"] = ModelDef(_LLAMA_TREE, reader_wrapper=_VL_WRAP)
REGISTRY["deepseek_vl"] = ModelDef(_LLAMA_TREE, reader_wrapper=_VL_WRAP)
REGISTRY["ovis"] = ModelDef(_LLAMA_TREE, reader_wrapper=_VL_WRAP)
REGISTRY["ovis2"] = ModelDef(_LLAMA_TREE, reader_wrapper=_VL_WRAP)
REGISTRY["ovis2_5"] = ModelDef(_QWEN3_TREE, reader_wrapper=_VL_WRAP)
REGISTRY["ovis2_6_next"] = ModelDef(_QWEN3_TREE, reader_wrapper=_VL_WRAP)
REGISTRY["ovis2_6_moe"] = ModelDef(
    _QWEN3_MOE_TREE,
    dynamic_expert_index="llm_config.num_experts|text_config.num_experts",
    reader_wrapper=_VL_WRAP,
)
REGISTRY["minicpmv"] = ModelDef(_LLAMA_TREE, reader_wrapper=_VL_WRAP)
REGISTRY["minicpmo"] = ModelDef(_LLAMA_TREE, reader_wrapper=_VL_WRAP)
# minicpmv4_6 re-registered below with the qwen3_5-style hybrid tree
REGISTRY["internvl_chat"] = ModelDef(_QWEN3_TREE, reader_wrapper=_VL_WRAP)
REGISTRY["interns1"] = ModelDef(_QWEN3_TREE, reader_wrapper=_VL_WRAP)
REGISTRY["mllama"] = ModelDef(_LLAMA_TREE, reader_wrapper=_VL_WRAP)
REGISTRY["mllama_text_model"] = ModelDef(_LLAMA_TREE)
REGISTRY["deepseek_vl_v2"] = ModelDef(
    _DEEPSEEK_TREE,
    dynamic_expert_index=(
        "language_config.n_routed_experts|text_config.n_routed_experts"
    ),
    reader_wrapper=_VL_WRAP,
)
REGISTRY["deepseek_ocr2"] = ModelDef(
    _DEEPSEEK_TREE,
    dynamic_expert_index=(
        "language_config.n_routed_experts|text_config.n_routed_experts"
        "|n_routed_experts"
    ),
    reader_wrapper=_VL_WRAP,
)
REGISTRY["kimi_k25"] = ModelDef(
    _DEEPSEEK_TREE,
    dynamic_expert_index=(
        "language_config.n_routed_experts|text_config.n_routed_experts"
        "|n_routed_experts"
    ),
    reader_wrapper=_VL_WRAP,
)
REGISTRY["qwen2_5_omni"] = ModelDef(_LLAMA_TREE, reader_wrapper=_VL_WRAP)
REGISTRY["qwen3_omni_moe"] = ModelDef(
    _QWEN3_MOE_TREE,
    dynamic_expert_index="thinker_config.text_config.num_experts",
    reader_wrapper=_VL_WRAP,
)
REGISTRY["phi4mm"] = ModelDef(
    _PHI3_TREE,
    reader_wrapper=__import__(
        "gptqmodel_tpu.models.remap", fromlist=["wrap_phi4mm_reader"]
    ).wrap_phi4mm_reader,
)
# moss: codegen-family body (fused mp_num=4 qkv_proj deinterleaved by the
# codegen reader; definitions/moss.py tree = ln_1 / attn qkv_proj+out_proj /
# mlp fc_in+fc_out under transformer.h)
REGISTRY["moss"] = ModelDef(
    _GPTJ_TREE,
    pre_lm_head_norm="transformer.ln_f",
    reader_wrapper=__import__(
        "gptqmodel_tpu.models.remap", fromlist=["wrap_codegen_reader"]
    ).wrap_codegen_reader,
)

# ---------------------------------------------------------------------------
# Batch-3 MoE / hybrid archs (reference definitions/<name>.py trees). Forward
# support: archs whose layer structure matches an existing family run through
# the structural forward (per-layer experts detection); the rest are
# quantize-tree + weight-only (RTN/FP8/GGUF) coverage until their forward
# lands (STATUS.md tracks which).

_GUD = ("gate_proj:0", "up_proj:0", "down_proj:1")

# afmoe (definitions/afmoe.py): llama attn + optional MoE with an ungated
# shared expert
REGISTRY["afmoe"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
            "post_attention_layernorm": ("post_attention_layernorm:!",),
            "mlp:moe:?": {
                "gate": ("gate:!",),
                "shared_expert": _GUD,
                "experts": {"#": _GUD},
            },
        },
    ),
    dynamic_expert_index="num_experts",
)

# klear (definitions/klear.py): llama attn + deepseek-style routed+shared MoE
REGISTRY["klear"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
            "post_attention_layernorm": ("post_attention_layernorm:!",),
            "mlp:moe:?": {
                "": _GUD,
                "gate": ("gate:!",),
                "shared_experts": _GUD,
                "experts": {"#": _GUD},
            },
        },
    ),
    dynamic_expert_index="num_experts",
)

# laguna (definitions/laguna.py): llama attn + per-head q/k norms + dense
# g_proj output gate + MoE with singular/plural shared expert naming
REGISTRY["laguna"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "self_attn": (
                "q_norm:!", "k_norm:!", "g_proj:!",
                "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
            ),
            "post_attention_layernorm": ("post_attention_layernorm:!",),
            "mlp:moe:?": {
                "": _GUD,
                "gate": ("gate:!",),
                "shared_experts": _GUD,
                "shared_expert": _GUD,
                "experts": {"#": _GUD},
            },
        },
    ),
    dynamic_expert_index="num_experts",
)

# hy_v3 (definitions/hy_v3.py): hunyuan-3 — qk norms + routed/shared MoE
# with dense-fallback prefix layers
REGISTRY["hy_v3"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "self_attn": (
                "q_norm:!", "k_norm:!",
                "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
            ),
            "post_attention_layernorm": ("post_attention_layernorm:!",),
            "mlp:moe:?": {
                "": _GUD,
                "gate": ("gate:!",),
                "shared_experts": _GUD,
                "experts": {"#": _GUD},
            },
        },
    ),
    dynamic_expert_index="num_experts",
)

# cohere2_moe (definitions/cohere2_moe.py): parallel-residual cohere block
# with dense prefix layers + routed MoE
REGISTRY["cohere2_moe"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
            "mlp:moe:?": {
                "": _GUD,
                "gate": ("gate:!",),
                "experts": {"#": _GUD},
            },
        },
    ),
    dynamic_expert_index="num_experts",
)

# solar_open (definitions/solar_open.py): llama attn + routed+shared MoE
# with a dense score-correction bias
REGISTRY["solar_open"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
            "post_attention_layernorm": ("post_attention_layernorm:!",),
            "mlp:moe:?": {
                "": _GUD,
                "gate": ("gate:!",),
                "shared_experts": _GUD,
                "experts": {"#": _GUD},
            },
        },
    ),
    dynamic_expert_index="n_routed_experts",
)

# solar_open2 (definitions/solar_open2.py): adds Kimi-Delta linear-attention
# layers sharing the q/k/v/o projections (dense KDA decay/beta/conv params)
REGISTRY["solar_open2"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "self_attn": (
                "q_norm:!", "k_norm:!", "o_norm:!",
                "q_proj:0", "k_proj:0", "v_proj:0", "g_proj:0", "o_proj:1",
            ),
            "post_attention_layernorm": ("post_attention_layernorm:!",),
            "mlp:moe:?": {
                "": _GUD,
                "gate": ("gate:!",),
                "shared_experts": _GUD,
                "experts": {"#": _GUD},
            },
        },
    ),
    dynamic_expert_index="n_routed_experts",
)

# grinmoe (definitions/grinmoe.py): phimoe sparsemixer body (w1/w3/w2)
REGISTRY["grinmoe"] = REGISTRY["phimoe"]

# minimax_m2 (definitions/minimax_m2.py): per-head q/k norms + w1/w3/w2 MoE
# with sigmoid scoring + score-correction bias
REGISTRY["minimax_m2"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "self_attn": (
                "q_norm:!", "k_norm:!",
                "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
            ),
            "post_attention_layernorm": ("post_attention_layernorm:!",),
            "block_sparse_moe:moe": {
                "gate": ("gate:!",),
                "e_score_correction_bias": ("e_score_correction_bias:!",),
                "experts": {"#": ("w1:0", "w3:0", "w2:1")},
            },
        },
    ),
    dynamic_expert_index="num_local_experts",
)

# mimo_v2 (definitions/mimo_v2.py): split or fused qkv + dense/MoE layers
# per moe_layer_freq
REGISTRY["mimo_v2"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "self_attn": (
                "qkv_proj:0", "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
            ),
            "post_attention_layernorm": ("post_attention_layernorm:!",),
            "mlp:moe:?": {
                "": _GUD,
                "gate": ("gate:!",),
                "experts": {"#": _GUD},
            },
        },
    ),
    dynamic_expert_index="n_routed_experts",
)

# glm4_moe_lite (definitions/glm4_moe_lite.py): MLA attention (lite q_proj or
# full q_a/q_b) + glm4_moe-style routed/shared MoE
REGISTRY["glm4_moe_lite"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "self_attn": (
                "q_proj:0", "q_a_proj:0", "kv_a_proj_with_mqa:0",
                "q_b_proj:1", "kv_b_proj:1", "o_proj:2",
            ),
            "post_attention_layernorm": ("post_attention_layernorm:!",),
            "mlp:moe:?": {
                "": _GUD,
                "gate": ("gate:!",),
                "shared_experts": _GUD,
                "experts": {"#": _GUD},
            },
        },
    ),
    dynamic_expert_index="n_routed_experts",
)

# glm_moe_dsa (definitions/glm_moe_dsa.py): GLM-5 MLA + DSA indexer
# projections (dotted leaf paths)
REGISTRY["glm_moe_dsa"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "self_attn": (
                "q_proj:0", "q_a_proj:0", "kv_a_proj_with_mqa:0",
                "indexer.wk:0", "q_b_proj:1", "kv_b_proj:1",
                "indexer.wq_b:1", "o_proj:2",
            ),
            "post_attention_layernorm": ("post_attention_layernorm:!",),
            "mlp:moe:?": {
                "": _GUD,
                "gate": ("gate:!",),
                "shared_experts": _GUD,
                "experts": {"#": _GUD},
            },
        },
    ),
    dynamic_expert_index="n_routed_experts",
)

# deepseek_v4 (definitions/deepseek_v4.py): next-gen MLA split
# (q_a/q_b + o_a/o_b + joint kv_proj with norms)
REGISTRY["deepseek_v4"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "self_attn": (
                "q_a_norm:!", "q_b_norm:!", "kv_norm:!", "o_a_proj:!",
                "q_a_proj:0", "q_b_proj:0", "o_b_proj:1", "kv_proj:2",
            ),
            "post_attention_layernorm": ("post_attention_layernorm:!",),
            "mlp:moe:?": {
                "": _GUD,
                "gate": ("gate:!",),
                "shared_experts": _GUD,
                "experts": {"#": _GUD},
            },
        },
    ),
    dynamic_expert_index="n_routed_experts",
)

# axk2 (definitions/axk2.py): SKT A.X-K2 — MLA with fused q_gate_proj
REGISTRY["axk2"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "self_attn": (
                "q_a_proj:0", "kv_a_proj_with_mqa:0",
                "q_gate_proj:1", "kv_b_proj:1", "o_proj:2",
            ),
            "post_attention_layernorm": ("post_attention_layernorm:!",),
            "mlp:moe:?": {
                "": _GUD,
                "gate": ("gate:!",),
                "shared_experts": _GUD,
                "experts": {"#": _GUD},
            },
        },
    ),
    dynamic_expert_index="n_routed_experts",
)

# brumby (definitions/brumby.py): retention attention with dense g_proj gate
REGISTRY["brumby"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "self_attn": (
                "q_norm:!", "k_norm:!", "g_proj:!",
                "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
            ),
            "post_attention_layernorm": ("post_attention_layernorm:!",),
            "mlp": _GUD,
        },
    ),
)

# lfm2_moe (definitions/lfm2_moe.py): lfm2 conv/attention body + w1/w3/w2
# MoE with dense-fallback layers
REGISTRY["lfm2_moe"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "operator_norm": ("operator_norm:!",),
            "self_attn": (
                "q_layernorm:!", "k_layernorm:!",
                "q_proj:0", "k_proj:0", "v_proj:0", "out_proj:1",
            ),
            "conv": ("in_proj:0", "out_proj:1"),
            "ffn_norm": ("ffn_norm:!",),
            "feed_forward:moe:?": {
                "": ("w1:0", "w3:0", "w2:1"),
                "gate": ("gate:!",),
                "experts": {"#": ("w1:0", "w3:0", "w2:1")},
            },
        },
    ),
    pre_lm_head_norm="model.embedding_norm",
    dynamic_expert_index="num_experts",
)

# hymba (definitions/hymba.py): parallel mamba+attention heads, single-expert
# MoE MLP
REGISTRY["hymba"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "mamba": ("in_proj:0", "out_proj:1"),
            "post_attention_layernorm": ("post_attention_layernorm:!",),
            "moe:moe": {"experts": {"#": _GUD}},
        },
    ),
    pre_lm_head_norm="model.final_layernorm",
    dynamic_expert_index="num_experts",
)

# zamba / zamba2 (definitions/zamba.py, zamba2.py): mamba backbone layers
# with an interleaved shared transformer block (mamba_decoder) + fused
# linear adapter
_ZAMBA_TREE = (
    "model", "layers", "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "mamba": ("in_proj:0", "out_proj:1"),
        "linear": ("linear:0",),
        "mamba_decoder": {
            "input_layernorm": ("input_layernorm:!",),
            "mamba": ("in_proj:0", "out_proj:1"),
        },
    },
)
REGISTRY["zamba"] = ModelDef(_ZAMBA_TREE, pre_lm_head_norm="model.final_layernorm")
REGISTRY["zamba2"] = ModelDef(_ZAMBA_TREE, pre_lm_head_norm="model.final_layernorm")

# nemotron_h (definitions/nemotron_h.py): mamba2/attention/MLP layers under a
# single mixer attribute, selected per layer by hybrid_override_pattern
REGISTRY["nemotron_h"] = ModelDef(
    (
        "backbone", "layers", "#",
        {
            "norm": ("norm:!",),
            "mixer": (
                "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
                "in_proj:2", "out_proj:2",
                "gate_proj:3", "up_proj:3", "down_proj:4",
            ),
        },
    ),
    pre_lm_head_norm="backbone.norm_f",
)

# dbrx_converted (definitions/dbrx_converted.py): pre-split dbrx exports
REGISTRY["dbrx_converted"] = ModelDef(
    (
        "transformer", "blocks", "#",
        {
            "norm_attn_norm": {
                "attn": ("q_proj:0", "k_proj:0", "v_proj:0", "out_proj:1"),
            },
            "ffn:moe": {
                "experts": {"mlp": {"#": ("w1:0", "v1:0", "w2:1")}},
            },
        },
    ),
    pre_lm_head_norm="transformer.norm_f",
    dynamic_expert_index="ffn_config.moe_num_experts",
)

# gemma3n (definitions/gemma3n.py): gemma3 body + v_norm and per-layer-input
# adapter projections (altup/laurel params stay dense)
_GEMMA3N_BLOCK = {
    "input_layernorm": ("input_layernorm:!",),
    "self_attn": (
        "q_norm:!", "k_norm:!", "v_norm:!",
        "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
    ),
    "post_attention_layernorm": ("post_attention_layernorm:!",),
    "pre_feedforward_layernorm": ("pre_feedforward_layernorm:!",),
    "mlp": _GUD,
    "post_feedforward_layernorm": ("post_feedforward_layernorm:!",),
    "per_layer_input_gate": ("per_layer_input_gate:0",),
    "post_per_layer_input_norm": ("post_per_layer_input_norm:!",),
    "per_layer_projection": ("per_layer_projection:1",),
}
REGISTRY["gemma3n_text"] = ModelDef(("model", "layers", "#", _GEMMA3N_BLOCK))
REGISTRY["gemma3n"] = ModelDef(
    ("model", "layers", "#", _GEMMA3N_BLOCK), reader_wrapper=_VL_WRAP
)
# gemma4 (definitions/gemma4.py, gemma4_unified.py): same adapter block shape
REGISTRY["gemma4_text"] = REGISTRY["gemma3n_text"]
REGISTRY["gemma4"] = REGISTRY["gemma3n"]
REGISTRY["gemma4_unified"] = REGISTRY["gemma3n"]
REGISTRY["gemma4_unified_text"] = REGISTRY["gemma3n_text"]

# intern_s2_preview (definitions/intern_s2_preview.py): qwen3-next-style
# hybrid tower under model.language_model
REGISTRY["intern_s2_preview"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "self_attn": (
                "q_norm:!", "k_norm:!",
                "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
            ),
            "linear_attn": (
                "norm:!", "in_proj_qkv:0", "in_proj_z:1", "out_proj:2",
            ),
            "post_attention_layernorm": ("post_attention_layernorm:!",),
            "mlp:moe:?": {
                "gate": ("gate:!",),
                "shared_expert_gate": ("shared_expert_gate:!",),
                "shared_expert": _GUD,
                "experts": {"#": _GUD},
            },
        },
    ),
    dynamic_expert_index="num_experts|text_config.num_experts",
    reader_wrapper=_VL_WRAP,
)

# inkling_mm_model (definitions/inkling.py): MLA-ish attn with r_proj +
# routed MoE tower under model.language_model
REGISTRY["inkling_mm_model"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "self_attn": (
                "q_norm:!", "k_norm:!",
                "q_proj:0", "k_proj:0", "v_proj:0", "r_proj:0", "o_proj:1",
            ),
            "post_attention_layernorm": ("post_attention_layernorm:!",),
            "mlp:moe:?": {
                "": _GUD,
                "gate": ("gate:!",),
                "shared_experts": _GUD,
                "experts": {"#": _GUD},
            },
        },
    ),
    dynamic_expert_index=(
        "n_routed_experts|text_config.n_routed_experts"
        "|language_config.n_routed_experts"
    ),
    reader_wrapper=_VL_WRAP,
)

# ernie4_5_vl_moe (definitions/ernie4_5_vl_moe.py): text+vision expert pools
# under model.language_model; text-only calibration exercises text_moe
_ERNIE_VL_MOE = {
    "input_layernorm": ("input_layernorm:!",),
    "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
    "post_attention_layernorm": ("post_attention_layernorm:!",),
    "mlp:moe:?": {
        "": _GUD,
        "shared_experts": _GUD,
        "text_moe": {
            "gate": ("gate:!",),
            "experts": {"#": ("gate_proj:0", "up_proj:0", "upe_proj:0",
                              "down_proj:1")},
        },
        "vision_moe": {
            "gate": ("gate:!",),
            "experts": {"#": ("gate_proj:0", "up_proj:0", "upe_proj:0",
                              "down_proj:1")},
        },
    },
}
REGISTRY["ernie4_5_vl_moe"] = ModelDef(
    ("model", "layers", "#", _ERNIE_VL_MOE),
    dynamic_expert_index="moe_num_experts|text_config.moe_num_experts",
    reader_wrapper=_VL_WRAP,
)
REGISTRY["ernie4_5_moe_vl"] = REGISTRY["ernie4_5_vl_moe"]

# text-only tower aliases (reference registers the *_text model_types
# separately so standalone text configs load directly)
REGISTRY["qwen2_vl_text"] = REGISTRY["llama"]
REGISTRY["qwen2_5_vl_text"] = REGISTRY["llama"]
REGISTRY["glm4v_moe_text"] = REGISTRY["glm4_moe"]

# bailing_moe / bailing_hybrid + llada2_moe (definitions/bailing_moe.py,
# llada2.py): fused attention.query_key_value/dense canonicalized to
# self_attn.qkv_proj/o_proj by wrap_bailing_reader
_BAILING_TREE = (
    "model", "layers", "#",
    {
        "input_layernorm": ("input_layernorm:!",),
        "self_attn": ("q_norm:!", "k_norm:!", "qkv_proj:0", "o_proj:1"),
        "post_attention_layernorm": ("post_attention_layernorm:!",),
        "mlp:moe:?": {
            "": _GUD,
            "gate": ("gate:!",),
            "shared_experts": _GUD,
            "experts": {"#": _GUD},
        },
    },
)
_BAILING_WRAP = __import__(
    "gptqmodel_tpu.models.remap", fromlist=["wrap_bailing_reader"]
).wrap_bailing_reader

# chatglm (chatglm2/3, glm-4 remote code; reference definitions/chatglm.py):
# glm-family body canonicalized by wrap_chatglm_reader; quantizes fused
# qkv + dense + fused swiglu per layer
REGISTRY["chatglm"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "self_attn": ("qkv_proj:0", "o_proj:1"),
            "post_attention_layernorm": ("post_attention_layernorm:!",),
            "mlp": ("gate_up_proj:0", "down_proj:1"),
        },
    ),
    reader_wrapper=__import__(
        "gptqmodel_tpu.models.remap", fromlist=["wrap_chatglm_reader"]
    ).wrap_chatglm_reader,
)

# qwen (QWen-1 remote code; reference definitions/qwen.py): llama body with
# fused biased c_attn + w1/w2 swiglu, canonicalized by wrap_qwen1_reader
REGISTRY["qwen"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "self_attn": ("qkv_proj:0", "o_proj:1"),
            "post_attention_layernorm": ("post_attention_layernorm:!",),
            "mlp": ("gate_proj:0", "up_proj:0", "down_proj:1"),
        },
    ),
    reader_wrapper=__import__(
        "gptqmodel_tpu.models.remap", fromlist=["wrap_qwen1_reader"]
    ).wrap_qwen1_reader,
)
REGISTRY["bailing_moe"] = ModelDef(
    _BAILING_TREE, dynamic_expert_index="num_experts",
    reader_wrapper=_BAILING_WRAP,
)
REGISTRY["bailing_hybrid"] = REGISTRY["bailing_moe"]
REGISTRY["llada2_moe"] = ModelDef(
    _BAILING_TREE, dynamic_expert_index="num_experts",
    reader_wrapper=_BAILING_WRAP,
)

_REMAP = __import__(
    "gptqmodel_tpu.models.remap",
    fromlist=["wrap_rw_reader", "wrap_nemotron_omni_reader",
              "wrap_telechat_reader", "wrap_hrm_reader"],
)

# internlm v1 (remote code; reference definitions/internlm.py: LlamaQModel
# subclass): llama body with qkv/o bias (config key "bias")
REGISTRY["internlm"] = REGISTRY["llama"]

# decilm / nemotron-nas (reference definitions/decilm.py,
# layer_modules_strict=False "nemotron ultra skips modules"): NAS
# block_configs make whole sublayers optional — no_op blocks have NO
# attention/mlp, replace_with_linear blocks carry a single linear_attn /
# linear_mlp, attention blocks vary GQA via n_heads_in_group
_DECILM_TREE = (
    "model", "layers", "#",
    {
        "input_layernorm:?": ("input_layernorm:!",),
        "self_attn:?": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
                        "linear_attn:0"),
        "post_attention_layernorm:?": ("post_attention_layernorm:!",),
        "mlp:?": ("gate_proj:0", "up_proj:0", "down_proj:1", "linear_mlp:0"),
    },
)
REGISTRY["deci"] = ModelDef(_DECILM_TREE)
REGISTRY["nemotron-nas"] = REGISTRY["deci"]

# inkling (reference auto.py maps "inkling_mm_model"; some configs say
# "inkling")
REGISTRY["inkling"] = REGISTRY["inkling_mm_model"]

# RefinedWeb / RefinedWebModel (falcon-rw remote code; reference
# definitions/rw.py): falcon body, ln_1/ln_2 canonicalized by wrap_rw_reader
for _rw in ("RefinedWeb", "RefinedWebModel", "refinedWeb", "refinedWebModel",
            "refinedweb", "refinedwebmodel"):
    REGISTRY[_rw] = ModelDef(
        _FALCON_TREE, pre_lm_head_norm="transformer.ln_f",
        reader_wrapper=_REMAP.wrap_rw_reader,
    )

# telechat/telechat2 (remote code; reference definitions/telechat2.py):
# llama body under transformer.h with query + fused per-head key_value,
# split/canonicalized by wrap_telechat_reader
REGISTRY["telechat"] = ModelDef(
    _LLAMA_TREE, reader_wrapper=_REMAP.wrap_telechat_reader,
)
REGISTRY["telechat2"] = REGISTRY["telechat"]

# gpt_pangu (PanguAlpha remote code; reference definitions/pangu_alpha.py):
# gpt2-style pre-LN blocks with SEPARATE q/k/v Linears, gelu c_fc/c_proj
# MLP, learned absolute positions; the top_query_layer passes through dense
REGISTRY["gpt_pangu"] = ModelDef(
    (
        "transformer", "h", "#",
        {
            "ln_1": ("ln_1:!",),
            "attn": ("q_proj:0", "k_proj:0", "v_proj:0", "c_proj:1"),
            "ln_2": ("ln_2:!",),
            "mlp": ("c_fc:0", "c_proj:1"),
        },
    ),
    pre_lm_head_norm="transformer.ln_f",
)

# nemotron_labs_diffusion (reference definitions/nemotron_labs_diffusion.py):
# llama-block encoder with a diffusion head in place of lm_head
REGISTRY["nemotron_labs_diffusion"] = ModelDef(
    (
        "encoder", "layers", "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "self_attn": ("q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1"),
            "post_attention_layernorm": ("post_attention_layernorm:!",),
            "mlp": ("gate_proj:0", "up_proj:0", "down_proj:1"),
        },
    ),
    lm_head="diffusion_head",
    pre_lm_head_norm="encoder.norm",
)

# nemotronh_nano_omni_reasoning_v3 (reference definitions/nemotron_omni.py):
# nemotron_h backbone under language_model.*, canonicalized by
# wrap_nemotron_omni_reader; vision/sound towers re-export dense
REGISTRY["nemotronh_nano_omni_reasoning_v3"] = ModelDef(
    REGISTRY["nemotron_h"].module_tree,
    pre_lm_head_norm="backbone.norm_f",
    reader_wrapper=_REMAP.wrap_nemotron_omni_reader,
)

# nemotron_h_puzzle (reference definitions/nemotron_h_puzzle.py): NAS
# "puzzle" nemotron_h whose mixer slot may also hold a latent-compressed
# MoE (fc1/fc2 latent projections around up/down experts)
REGISTRY["nemotron_h_puzzle"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "norm": ("norm:!",),
            "mixer:moe:?": {
                "": (
                    "q_proj:0", "k_proj:0", "v_proj:0", "in_proj:0",
                    "o_proj:1", "out_proj:1",
                ),
                "fc1_latent_proj:2": ("fc1_latent_proj:0",),
                "experts": {"#": ("up_proj:0", "down_proj:1")},
                "fc2_latent_proj:3": ("fc2_latent_proj:0",),
                "shared_experts": ("up_proj:0", "down_proj:1"),
            },
        },
    ),
    pre_lm_head_norm="model.norm_f",
    dynamic_expert_index="n_routed_experts",
)

# hrm_text (reference definitions/hrm_text.py): dual L_module/H_module
# decoder stacks flattened to one model.layers stack by wrap_hrm_reader;
# attention carries a gated branch (gate_proj) beside q/k/v
REGISTRY["hrm_text"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "self_attn": (
                "q_proj:0", "k_proj:0", "v_proj:0", "gate_proj:0", "o_proj:1",
            ),
            "post_attention_layernorm": ("post_attention_layernorm:!",),
            "mlp": ("gate_proj:0", "up_proj:0", "down_proj:1"),
        },
    ),
    reader_wrapper=_REMAP.wrap_hrm_reader,
)

# minimax_m3_vl (reference definitions/minimax_m3_vl.py): minimax-m2-style
# MoE text tower under model.language_model with a deepseek-v3.2-style
# attention indexer (quantized alongside q/k/v; the dense forward ignores
# the index selection — a superset of sparse attention)
REGISTRY["minimax_m3_vl"] = ModelDef(
    (
        "model", "layers", "#",
        {
            "input_layernorm": ("input_layernorm:!",),
            "self_attn": (
                "q_proj:0", "q_norm:!", "k_proj:0", "k_norm:!", "v_proj:0",
                "indexer.q_proj:0", "indexer.q_norm:!",
                "indexer.k_proj:0", "indexer.k_norm:!",
                "o_proj:1",
            ),
            "post_attention_layernorm": ("post_attention_layernorm:!",),
            "mlp:moe:?": {
                "": ("gate_up_proj:0", "down_proj:1"),
                "gate": ("gate:!", "e_score_correction_bias:!"),
                "shared_experts": ("gate_up_proj:0", "down_proj:1"),
                "experts": {"#": ("gate_proj:0", "up_proj:0", "down_proj:1")},
            },
        },
    ),
    dynamic_expert_index="num_local_experts|text_config.num_local_experts",
    reader_wrapper=_VL_WRAP,
)

# qwen3_5 family (reference definitions/qwen3_5.py, qwen3_5_moe.py):
# qwen3_next-style hybrid (gated full attention + GatedDeltaNet linear
# layers) with SEPARATE deltanet projections (in_proj_qkv / in_proj_z /
# in_proj_b / in_proj_a instead of fused qkvz/ba); VL variants nest the
# tower under model.language_model (mtp tensors pass through dense)
_QWEN3_5_LINEAR = (
    "norm:!", "conv1d:!",
    "in_proj_qkv:0", "in_proj_z:1", "in_proj_b:!:1", "in_proj_a:!:1",
    "out_proj:2",
)
_QWEN3_5_BLOCK = {
    "input_layernorm": ("input_layernorm:!",),
    "self_attn": (
        "q_norm:!", "k_norm:!",
        "q_proj:0", "k_proj:0", "v_proj:0", "o_proj:1",
    ),
    "linear_attn": _QWEN3_5_LINEAR,
    "post_attention_layernorm": ("post_attention_layernorm:!",),
    "mlp": ("gate_proj:0", "up_proj:0", "down_proj:1"),
}
_QWEN3_5_MOE_BLOCK = {
    **_QWEN3_5_BLOCK,
    "mlp:moe:?": {
        "gate": ("gate:!",),
        "shared_expert_gate": ("shared_expert_gate:!",),
        "shared_expert": ("gate_proj:0", "up_proj:0", "down_proj:1"),
        "experts": {"#": ("gate_proj:0", "up_proj:0", "down_proj:1")},
    },
}
_QWEN3_5_MOE_BLOCK.pop("mlp")
REGISTRY["qwen3_5_text"] = ModelDef(
    ("model", "layers", "#", _QWEN3_5_BLOCK),
)
REGISTRY["qwen3_5"] = ModelDef(
    ("model", "layers", "#", _QWEN3_5_BLOCK), reader_wrapper=_VL_WRAP,
)
REGISTRY["qwen3_5_moe_text"] = ModelDef(
    ("model", "layers", "#", _QWEN3_5_MOE_BLOCK),
    dynamic_expert_index="num_experts|text_config.num_experts",
)
REGISTRY["qwen3_5_moe"] = ModelDef(
    ("model", "layers", "#", _QWEN3_5_MOE_BLOCK),
    dynamic_expert_index="num_experts|text_config.num_experts",
    reader_wrapper=_VL_WRAP,
)
# minicpmv4_6's language tower is the same qwen3_5-style hybrid (reference
# definitions/minicpmv_4_6.py tree carries the identical linear_attn leaves)
REGISTRY["minicpmv4_6"] = ModelDef(
    ("model", "layers", "#", _QWEN3_5_BLOCK), reader_wrapper=_VL_WRAP,
)


def get_model_def(model_type: str, tensor_names=None) -> ModelDef:
    """Resolve a ModelDef; unknown archs auto-detect from tensor names.

    ``tensor_names``: optional iterable of checkpoint tensor names. When the
    model_type has no registered definition, the module tree is inferred
    structurally from the names (models/tree_detect.py) — the analog of the
    reference's per-arch definition lookup (gptqmodel/models/auto.py), which
    raises on unknown archs. Final fallback: the llama tree.
    """
    if model_type in REGISTRY:
        return REGISTRY[model_type]
    if tensor_names is not None:
        from gptqmodel_tpu.models.tree_detect import detect_model_def

        mdef = detect_model_def(tensor_names)
        if mdef is not None:
            return mdef
    # unknown arch: llama-shaped fallback
    return ModelDef(_LLAMA_TREE)


# Modules whose inputs are provably identical in our functional forward
# (transformer.py): q/k/v see the same normed hidden; gate/up the same.
# Lets the looper share one Hessian and one batched solve per input group
# (the reference computes per-module Hessians that are equal anyway).
SHARED_INPUT_LEAVES = {
    "q_proj": "qkv",
    "k_proj": "qkv",
    "v_proj": "qkv",
    "q_a_proj": "qkv",  # deepseek MLA: q_a/kv_a consume the same normed hidden
    "kv_a_proj_with_mqa": "qkv",
    "gate_proj": "gate_up",
    "up_proj": "gate_up",
    "w1": "gate_up",
    "w3": "gate_up",
    "in_proj_qkvz": "qkvz_ba",  # qwen3_next deltanet: same normed hidden
    "in_proj_ba": "qkvz_ba",
    "in_proj_qkv": "qkvz_ba",  # qwen3_5 split deltanet: same normed hidden
    "in_proj_z": "qkvz_ba",
    "qkv_proj": "qkv",  # fused qkv (phi3/internlm2) — singleton unless the
    "output_gate": "qkv",  # minimax lightning gate shares the layer input
}


def input_group_key(path: str) -> str:
    """Canonical input-group key for a module path within a layer."""
    parent, _, leaf = path.rpartition(".")
    shared = SHARED_INPUT_LEAVES.get(leaf)
    return f"{parent}::{shared}" if shared else path


def tap_representative(paths: list[str]) -> str:
    """One member path per input group — the tap the forward must record."""
    return sorted(paths)[0]
