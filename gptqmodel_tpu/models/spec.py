"""ModelSpec: static architecture description derived from an HF config.

TPU-native replacement for the reference's per-arch ``BaseQModel`` subclasses
plus HF torch modeling code (SURVEY §2.2): the spec captures everything the
functional JAX forward needs (shapes, norm/act variants, RoPE, MoE routing),
while ``module_tree`` (same DSL as the reference) drives quantization
grouping. One spec type covers the llama lineage — per-arch differences are
data, not classes.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Optional


@dataclass(frozen=True)
class ModelSpec:
    model_type: str
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False
    hidden_act: str = "silu"
    qk_norm: bool = False  # qwen3-style per-head RMSNorm on q/k
    attention_bias: bool = False  # qwen2-style qkv bias
    mlp_bias: bool = False
    rope_scaling: Optional[dict] = None  # llama3-style {factor, low/high_freq...}
    # MoE (0 experts == dense)
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    norm_topk_prob: bool = True
    # deepseek-style MoE extensions
    n_shared_experts: int = 0
    first_k_dense_replace: int = 0
    moe_topk_method: str = "greedy"  # greedy | group_limited_greedy | noaux_tc
    moe_scoring: str = "softmax"  # softmax | sigmoid
    n_group: int = 0
    topk_group: int = 0
    routed_scaling_factor: float = 1.0
    # deepseek MLA (multi-head latent attention)
    mla: bool = False
    q_lora_rank: int = 0
    kv_lora_rank: int = 0
    qk_rope_head_dim: int = 0
    qk_nope_head_dim: int = 0
    v_head_dim: int = 0
    rope_interleave: bool = False  # deepseek pair-interleaved rope
    # gemma-style tweaks
    embedding_multiplier: float = 1.0
    logit_softcap: float = 0.0
    attn_softcap: float = 0.0
    rms_norm_offset: bool = False  # gemma: (1 + w) * normed
    post_norms: bool = False  # gemma2: pre+post attention/ffn norms
    query_pre_attn_scalar: float = 0.0  # gemma2 attention scale override
    sliding_window: int = 0
    layer_types: tuple = ()  # per-layer attn type, e.g. gemma3/gpt-oss
    rope_local_theta: float = 0.0  # gemma3: separate rope base for sliding layers
    # forward-family selector: "llama" (RoPE+RMSNorm+gated MLP lineage),
    # "opt" (learned positions, LayerNorm+bias, plain MLP),
    # "gpt2" (Conv1D fused c_attn, learned positions, gelu_new MLP),
    # "bloom" (ALiBi, per-head-interleaved fused QKV, embedding layernorm),
    # "neox" (gpt_neox/gptj/falcon/phi/stablelm: LayerNorm+bias, partial
    #   rotary, optional parallel attn+mlp residual)
    family: str = "llama"
    do_layer_norm_before: bool = True  # opt pre/post-norm variant
    apply_residual_post_ln: bool = False  # bloom residual variant
    # neox-lineage knobs (reference definitions/gpt_neox.py, gptj.py,
    # falcon.py, phi.py, stablelm.py)
    parallel_residual: bool = False  # x + attn(ln(x)) + mlp(ln'(x))
    dual_parallel_ln: bool = False  # neox/falcon-new: separate mlp-branch ln
    rotary_dim: int = 0  # partial rotary (0 = full head_dim)
    qkv_layout: str = "split"  # split | neox_fused | falcon_fused | falcon_grouped
    neox_gated_mlp: bool = False  # stablelm: silu gate/up/down MLP
    alibi: bool = False  # falcon-rw: ALiBi instead of rope
    # llama-family layer-structure variants (cohere/olmo/granite lineage)
    norm_type: str = "rms"  # rms | ln (mean-centered, optional bias) | ln_np
    #   (non-parametric LayerNorm — olmo)
    norm_after: bool = False  # olmo2/exaone4: norm on sublayer OUTPUT, no
    #   input norms (h = x + post_norm(sublayer(x)))
    qk_norm_wide: bool = False  # olmo2/olmoe: q/k norm over the FULL
    #   projection width (before head split) instead of per-head
    qk_norm_ln: bool = False  # cohere: per-head mean-centered LayerNorm
    clip_qkv: float = 0.0  # olmo: clamp q/k/v projections to [-clip, clip]
    attn_scale: float = 0.0  # granite attention_multiplier (direct scale)
    residual_multiplier: float = 1.0  # granite: h = x + mult * sublayer
    logit_scale: float = 1.0  # cohere logit_scale / granite 1/logits_scaling
    rope_sliding_only: bool = False  # cohere2/exaone4-hybrid: full-attention
    #   layers skip RoPE entirely (position info only via sliding layers)
    no_rope_layers: tuple = ()  # smollm3: per-layer 1=rope, 0=NoPE
    #   (modeling_smollm3.py:147 use_rope)
    router_jitter: float = 0.0  # phimoe sparsemixer jitter epsilon
    # gpt_oss clamped GLU: inner = (clip(up)+1) * gate*sigmoid(alpha*gate)
    # with gate clamped from above (modeling_gpt_oss.py:117-135)
    glu_clamp_limit: float = 0.0
    glu_alpha: float = 1.702
    # mamba family (falcon_mamba/mamba selective SSM)
    mamba_d_inner: int = 0
    mamba_d_state: int = 16
    mamba_d_conv: int = 4
    mamba_dt_rank: int = 0
    mixer_rms_eps: float = 0.0  # falcon_mamba b_c_dt RMS (0 = off)
    # mamba2/SSD additions (0 heads = mamba1)
    mamba_n_heads: int = 0
    mamba_n_groups: int = 1
    mamba_dt_limit: tuple = (0.0, float("inf"))
    # bamba-style hybrids: per-layer "attention" | "mamba"
    layers_block_type: tuple = ()
    # longcat_flash dual-sublayer + shortcut-MoE layers
    longcat: bool = False
    zero_expert_num: int = 0  # identity experts appended after the routed set
    mla_scale_q_lora: float = 0.0  # (hidden/q_lora_rank)^0.5 mup (0 = off)
    mla_scale_kv_lora: float = 0.0
    # falcon_h1 parallel mamba2+attention hybrid with mup multipliers
    falcon_h1: bool = False
    key_multiplier: float = 0.0  # scales k after projection (0 = off)
    # (attn_in, attn_out, ssm_in, ssm_out, mlp_gate, mlp_down)
    fh1_multipliers: tuple = ()
    fh1_ssm_multipliers: tuple = ()  # (z, x, B, C, dt) mup spans
    mamba_norm_before_gate: bool = False  # falcon_h1: per-group norm THEN gate
    # minimax lightning-attention hybrid
    minimax_residual: bool = False  # normed-residual + per-kind alpha/beta
    # (full_attn_a, full_attn_b, linear_attn_a, linear_attn_b, mlp_a, mlp_b)
    minimax_factors: tuple = ()
    # qwen3_next gated-attention + GatedDeltaNet hybrid
    attn_output_gate: bool = False  # q_proj doubles as [q | sigmoid-gate]
    linear_num_v_heads: int = 0  # DeltaNet value heads
    linear_num_k_heads: int = 0
    linear_k_head_dim: int = 0
    linear_v_head_dim: int = 0
    # llama4 attention variants
    qk_norm_l2: bool = False  # weightless L2 norm on q/k AFTER rope
    attn_temp_tuning: bool = False  # NoPE-layer q temperature scaling
    attn_temp_floor: float = 8192.0
    attn_temp_scale: float = 0.1
    attention_chunk_size: int = 0  # chunked-causal mask on chunked layers
    moe_input_scaled: bool = False  # llama4: routing weight scales the INPUT
    # mllama: cross-attention layer indices, skipped on text-only forward
    skip_layers: tuple = ()
    # decilm/nemotron-nas NAS heterogeneity: per-layer kv-head counts from
    # block_configs (0 = layer has no attention); no_op / replace_with_linear
    # sublayers are presence-driven in the forward
    layer_kv_heads: tuple = ()


_LLAMA_FAMILY = {
    "llama",
    "gemma3_text",
    "gemma3",
    "deepseek_v2",
    "deepseek_v3",
    "mistral",
    "qwen2",
    "qwen3",
    "qwen3_moe",
    "qwen2_moe",
    "mixtral",
    "gemma",
    "gemma2",
    "phi3",
    "granite",
    "internlm2",
    "starcoder2",
    "smollm3",
}


# VL model_type -> forward semantics of the text tower (reference
# definitions/base_qwen2_vl.py, llava quantize the language model; the
# vision tower stays dense). The wrap_vl_reader remap canonicalizes
# model.language_model.* -> model.*.
_VL_TEXT_ARCH = {
    "llava": None,  # use text_config.model_type (llama/mistral/...)
    "llava_onevision": None,  # qwen2 text tower
    "mistral3": None,  # mistral text tower (pixtral vision)
    "qwen2_vl": "qwen2",
    "qwen2_5_vl": "qwen2",
    "qwen3_vl": "qwen3",
    "qwen3_vl_moe": "qwen3_moe",
    "glm4v": "glm4",
    "glm4v_moe": "glm4_moe",
    "lfm2_vl": "lfm2",
    # batch 3 towers (reader remap in models/remap.wrap_vl_reader)
    "voxtral": None,  # llama text tower (definitions/voxtral.py)
    "glm_ocr": None,
    "glmasr": None,
    "deepseek_vl": None,  # llama tower (definitions/deepseek_vl.py)
    "deepseek_vl_v2": "deepseek_v2",  # language_config MoE tower
    "deepseek_ocr2": "deepseek_v2",
    "kimi_k25": "deepseek_v3",  # deepseek-v3 text backbone (kimi_k25.py)
    "ovis": None,  # llm_config tower (definitions/ovis.py)
    "ovis2": None,
    "ovis2_5": "qwen3",
    "ovis2_6_next": "qwen3",
    "ovis2_6_moe": "qwen3_moe",
    "minicpmv": None,  # llm tower under llm.* (definitions/minicpmv.py)
    "minicpmo": None,
    # qwen3_5-style hybrid tower (definitions/minicpmv_4_6.py linear_attn)
    "minicpmv4_6": "qwen3_5_text",
    "qwen3_5": "qwen3_5_text",  # VL nesting (definitions/qwen3_5.py)
    "qwen3_5_moe": "qwen3_5_moe_text",
    "minimax_m3_vl": "minimax_m2",  # m2 MoE body + attn indexer (m3_vl.py)
    "nemotronh_nano_omni_reasoning_v3": None,  # nemotron_h text_config
    "internvl_chat": None,  # llm_config (qwen2/qwen3/internlm2 towers)
    "interns1": None,
    "mllama": None,  # mllama_text_model tower (cross-attn layers skipped)
    "qwen2_5_omni": None,  # thinker.model tower (base_qwen2_5_omni.py)
    "qwen3_omni_moe": "qwen3_moe",
}

# Alias model_types whose body is exactly another registered arch
# (reference auto.py MODEL_MAP maps them onto the same QModel class).
_SPEC_ALIASES = {
    "yi": "llama",
    "stablelm_epoch": "llama",
    "longllama": "llama",
    "instella": "llama",
    "mobilellm": "llama",
    "deci": "llama",  # llama body; NAS block_configs handled generically
    "nemotron-nas": "llama",  # (per-layer GQA / no_op / linear sublayers)
    "ministral3": "mistral",
    "inkling": "inkling_mm_model",
    "nemotron_labs_diffusion": "llama",  # llama-block diffusion encoder
    "nemotron_h_puzzle": "nemotron_h",
    "dream": "qwen2",  # diffusion LM over a qwen2 body
    "llava_qwen2": "qwen2",
    "marin": "qwen3",
    "kimi_k2": "deepseek_v3",
    "moss": "codegen",  # codegen body (fused mp_num=4 qkv)
    "phi4mm": "phi3",  # phi3 body + LoRA shells (flattened by reader)
    "grinmoe": "phimoe",  # sparsemixer w1/w3/w2 body (definitions/grinmoe.py)
    "qwen2_vl_text": "qwen2",  # standalone text-tower configs
    "qwen2_5_vl_text": "qwen2",
    "glm4v_moe_text": "glm4_moe",
}


def spec_from_hf_config(cfg: dict[str, Any]) -> ModelSpec:
    """Build a ModelSpec from a parsed HF ``config.json`` dict."""
    mt = cfg.get("model_type", "llama")
    if mt in _SPEC_ALIASES:
        from dataclasses import replace as _dc_replace

        inner = dict(cfg)
        inner["model_type"] = _SPEC_ALIASES[mt]
        return _dc_replace(spec_from_hf_config(inner), model_type=mt)
    if mt in _VL_TEXT_ARCH:
        from dataclasses import replace as _dc_replace

        txt = dict(
            cfg.get("text_config")
            or cfg.get("llm_config")  # ovis / internvl_chat
            or cfg.get("language_config")  # deepseek_vl_v2 / kimi_k25
            or (cfg.get("thinker_config") or {}).get("text_config")  # omni
            or {k: v for k, v in cfg.items() if k != "model_type"}
            # minicpmv/minicpmo inline the llm fields in the top config
        )
        inner_mt = _VL_TEXT_ARCH[mt] or txt.get("model_type", "llama")
        txt["model_type"] = inner_mt
        rs = txt.get("rope_scaling")
        if rs and rs.get("rope_type", rs.get("type")) in ("mrope", "default"):
            # mrope with equal t/h/w position ids (text-only decode) is
            # EXACTLY standard rope (modeling_qwen2_vl.py apply_multimodal_
            # rotary_pos_emb); image-position decode is out of scope here
            if mt in ("glm4v", "glm4v_moe") and rs.get("mrope_section"):
                # glm4v rotates 2*sum(mrope_section) dims with interleaved
                # pairs — full-head for the published configs
                # (modeling_glm4v.py:459-485), unlike glm4's half
                hd_t = txt.get("head_dim") or (
                    txt["hidden_size"] // txt["num_attention_heads"]
                )
                txt["partial_rotary_factor"] = (
                    2.0 * sum(rs["mrope_section"]) / hd_t
                )
            txt["rope_scaling"] = None
        return _dc_replace(spec_from_hf_config(txt), model_type=mt)
    if mt == "opt":
        if cfg.get("word_embed_proj_dim", cfg["hidden_size"]) != cfg["hidden_size"]:
            raise NotImplementedError(
                "OPT word_embed_proj_dim != hidden_size (project_in/out) not "
                "supported yet"
            )
        return ModelSpec(
            model_type=mt,
            family="opt",
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["ffn_dim"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=cfg["num_attention_heads"],
            num_kv_heads=cfg["num_attention_heads"],
            head_dim=cfg["hidden_size"] // cfg["num_attention_heads"],
            max_position_embeddings=cfg.get("max_position_embeddings", 2048),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            hidden_act=cfg.get("activation_function", "relu"),
            do_layer_norm_before=cfg.get("do_layer_norm_before", True),
        )
    if mt == "gpt2":
        h = cfg["n_embd"]
        nh = cfg["n_head"]
        return ModelSpec(
            model_type=mt,
            family="gpt2",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg.get("n_inner") or 4 * h,
            num_layers=cfg["n_layer"],
            num_heads=nh,
            num_kv_heads=nh,
            head_dim=h // nh,
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            max_position_embeddings=cfg.get("n_positions", 1024),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            hidden_act=cfg.get("activation_function", "gelu_new"),
        )
    if mt == "gpt_pangu":
        # PanguAlpha remote code (reference definitions/pangu_alpha.py):
        # gpt2-style pre-LN blocks with SEPARATE q/k/v nn.Linears (no Conv1D
        # transpose), gelu c_fc/c_proj MLP, learned absolute positions; the
        # top-query layer's extra tensors pass through dense
        h = cfg.get("hidden_size") or cfg["n_embd"]
        nh = cfg.get("num_attention_heads") or cfg.get("num_heads") or cfg["n_head"]
        return ModelSpec(
            model_type=mt,
            family="gpt2",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg.get("intermediate_size")
            or cfg.get("n_inner") or 4 * h,
            num_layers=cfg.get("num_hidden_layers") or cfg.get("num_layers")
            or cfg["n_layer"],
            num_heads=nh,
            num_kv_heads=nh,
            head_dim=h // nh,
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            max_position_embeddings=cfg.get("max_position_embeddings")
            or cfg.get("n_positions", 1024),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            hidden_act=cfg.get("activation_function", "gelu"),
        )
    if mt == "gpt_bigcode":
        # starcoder1: gpt2 layout with nn.Linear (no Conv1D transpose) and
        # MQA (multi_query -> 1 kv head), gelu_pytorch_tanh
        # (modeling_gpt_bigcode.py GPTBigCodeAttention)
        h = cfg["n_embd"]
        nh = cfg["n_head"]
        return ModelSpec(
            model_type=mt,
            family="gpt2",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg.get("n_inner") or 4 * h,
            num_layers=cfg["n_layer"],
            num_heads=nh,
            num_kv_heads=1 if cfg.get("multi_query", True) else nh,
            head_dim=h // nh,
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            max_position_embeddings=cfg.get("n_positions", 1024),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            hidden_act=cfg.get("activation_function", "gelu_pytorch_tanh"),
        )
    if mt == "gpt_neox":
        h = cfg["hidden_size"]
        nh = cfg["num_attention_heads"]
        hd = h // nh
        return ModelSpec(
            model_type=mt,
            family="neox",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg.get("intermediate_size", 4 * h),
            num_layers=cfg["num_hidden_layers"],
            num_heads=nh,
            num_kv_heads=nh,
            head_dim=hd,
            rms_norm_eps=cfg.get("layer_norm_eps", 1e-5),
            rope_theta=cfg.get("rotary_emb_base", cfg.get("rope_theta", 10000.0)),
            max_position_embeddings=cfg.get("max_position_embeddings", 2048),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            hidden_act=cfg.get("hidden_act", "gelu"),
            rope_scaling=cfg.get("rope_scaling"),
            parallel_residual=cfg.get("use_parallel_residual", True),
            dual_parallel_ln=True,
            rotary_dim=int(hd * cfg.get("rotary_pct", 0.25)),
            qkv_layout="neox_fused",
        )
    if mt == "gpt_neo":
        # gpt2-family body with SPLIT nested attn.attention projections, NO
        # attention scaling (GPTNeoSelfAttention omits the /sqrt(hd)), and
        # global/local layer alternation with window_size
        # (modeling_gpt_neo.py GPTNeoSelfAttention/GPTNeoBlock)
        h = cfg["hidden_size"]
        nh = cfg["num_heads"]
        attn_layers = cfg.get("attention_layers")
        if attn_layers is None:
            # expand attention_types [[["global","local"],N]] the HF way
            attn_layers = []
            for item in cfg.get("attention_types", [[["global"], cfg["num_layers"]]]):
                attn_layers.extend(item[0] * item[1])
        return ModelSpec(
            model_type=mt,
            family="gpt2",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg.get("intermediate_size") or 4 * h,
            num_layers=cfg["num_layers"],
            num_heads=nh,
            num_kv_heads=nh,
            head_dim=h // nh,
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            max_position_embeddings=cfg.get("max_position_embeddings", 2048),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            hidden_act=cfg.get("activation_function", "gelu_new"),
            attn_scale=1.0,
            sliding_window=cfg.get("window_size", 256),
            layer_types=tuple(
                "sliding_attention" if t == "local" else "full_attention"
                for t in attn_layers
            ),
        )
    if mt == "codegen":
        # gptj body (parallel residual, rotate_every_two partial rotary,
        # fc_in/fc_out MLP) behind an mp_num=4 block-fused qkv_proj that
        # models/remap.wrap_codegen_reader splits back to q/k/v
        # (modeling_codegen.py:92-177)
        h = cfg["n_embd"]
        nh = cfg["n_head"]
        return ModelSpec(
            model_type=mt,
            family="neox",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg.get("n_inner") or 4 * h,
            num_layers=cfg["n_layer"],
            num_heads=nh,
            num_kv_heads=nh,
            head_dim=h // nh,
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            max_position_embeddings=cfg.get("n_positions", 2048),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            hidden_act=cfg.get("activation_function", "gelu_new"),
            parallel_residual=True,
            rotary_dim=cfg.get("rotary_dim") or h // nh,
            rope_interleave=True,
        )
    if mt == "gptj":
        h = cfg["n_embd"]
        nh = cfg["n_head"]
        return ModelSpec(
            model_type=mt,
            family="neox",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg.get("n_inner") or 4 * h,
            num_layers=cfg["n_layer"],
            num_heads=nh,
            num_kv_heads=nh,
            head_dim=h // nh,
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            max_position_embeddings=cfg.get("n_positions", 2048),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            hidden_act=cfg.get("activation_function", "gelu_new"),
            parallel_residual=True,
            rotary_dim=cfg.get("rotary_dim") or h // nh,
            rope_interleave=True,  # gptj rotate_every_two pairs
        )
    if mt.lower() in ("refinedweb", "refinedwebmodel"):
        # falcon-rw remote code (reference definitions/rw.py): falcon body
        # with GPT-style config keys (n_layer/n_head/n_head_kv)
        from dataclasses import replace as _dc_replace

        inner = dict(cfg)
        inner["model_type"] = "falcon"
        for src, dst in (("n_layer", "num_hidden_layers"),
                         ("n_head", "num_attention_heads"),
                         ("n_head_kv", "num_kv_heads")):
            if src in inner and dst not in inner:
                inner[dst] = inner[src]
        # RW-1b: parallel_attn=False multi_query=False alibi=True;
        # RW-7b: parallel_attn=True multi_query=True — all pass through
        return _dc_replace(spec_from_hf_config(inner), model_type=mt)
    if mt == "falcon":
        h = cfg["hidden_size"]
        nh = cfg["num_attention_heads"]
        new_arch = cfg.get("new_decoder_architecture", False)
        multi_query = cfg.get("multi_query", True)
        if new_arch:
            nkv = cfg.get("num_kv_heads") or nh
            layout = "falcon_grouped"
        elif multi_query:
            nkv = 1
            layout = "falcon_fused"
        else:
            nkv = nh
            layout = "neox_fused"  # falcon-rw: per-head [nh, 3, hd]
        parallel = cfg.get("parallel_attn", True)
        num_ln = cfg.get("num_ln_in_parallel_attn") or (2 if new_arch else 1)
        return ModelSpec(
            model_type=mt,
            family="neox",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg.get("ffn_hidden_size") or 4 * h,
            num_layers=cfg["num_hidden_layers"],
            num_heads=nh,
            num_kv_heads=nkv,
            head_dim=h // nh,
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            rope_theta=cfg.get("rope_theta", 10000.0),
            max_position_embeddings=cfg.get("max_position_embeddings", 2048),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            hidden_act=cfg.get("activation", "gelu"),
            rope_scaling=cfg.get("rope_scaling"),
            parallel_residual=parallel or new_arch,
            dual_parallel_ln=new_arch and num_ln == 2,
            qkv_layout=layout,
            alibi=cfg.get("alibi", False),
        )
    if mt == "phi":
        h = cfg["hidden_size"]
        nh = cfg["num_attention_heads"]
        hd = h // nh
        if cfg.get("qk_layernorm"):
            raise NotImplementedError("phi qk_layernorm not supported yet")
        return ModelSpec(
            model_type=mt,
            family="neox",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=nh,
            num_kv_heads=cfg.get("num_key_value_heads") or nh,
            head_dim=hd,
            rms_norm_eps=cfg.get("layer_norm_eps", 1e-5),
            rope_theta=cfg.get("rope_theta", 10000.0),
            max_position_embeddings=cfg.get("max_position_embeddings", 2048),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            hidden_act=cfg.get("hidden_act", "gelu_new"),
            rope_scaling=cfg.get("rope_scaling"),
            parallel_residual=True,  # phi: shared-ln parallel attn+mlp
            rotary_dim=int(hd * cfg.get("partial_rotary_factor", 0.5)),
        )
    if mt == "stablelm":
        h = cfg["hidden_size"]
        nh = cfg["num_attention_heads"]
        hd = h // nh
        if cfg.get("qk_layernorm"):
            raise NotImplementedError("stablelm qk_layernorm not supported yet")
        return ModelSpec(
            model_type=mt,
            family="neox",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=nh,
            num_kv_heads=cfg.get("num_key_value_heads") or nh,
            head_dim=hd,
            rms_norm_eps=cfg.get("layer_norm_eps", 1e-5),
            rope_theta=cfg.get("rope_theta", 10000.0),
            max_position_embeddings=cfg.get("max_position_embeddings", 4096),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            hidden_act=cfg.get("hidden_act", "silu"),
            attention_bias=cfg.get("use_qkv_bias", False),
            rope_scaling=cfg.get("rope_scaling"),
            parallel_residual=cfg.get("use_parallel_residual", False),
            rotary_dim=int(hd * cfg.get("partial_rotary_factor", 0.25)),
            neox_gated_mlp=True,
        )
    if mt == "persimmon":
        # neox-lineage: fused per-head query_key_value, dense o-proj,
        # dense_h_to_4h relu2 MLP, partial rotary 0.5, LayerNorm+bias
        # (modeling_persimmon.py:132-201)
        h = cfg["hidden_size"]
        nh = cfg["num_attention_heads"]
        hd = h // nh
        if cfg.get("qk_layernorm"):
            raise NotImplementedError("persimmon qk_layernorm not supported yet")
        return ModelSpec(
            model_type=mt,
            family="neox",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg.get("intermediate_size", 4 * h),
            num_layers=cfg["num_hidden_layers"],
            num_heads=nh,
            num_kv_heads=nh,
            head_dim=hd,
            rms_norm_eps=cfg.get("layer_norm_eps", 1e-5),
            rope_theta=cfg.get("rope_theta", 25000.0),
            max_position_embeddings=cfg.get("max_position_embeddings", 16384),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            hidden_act=cfg.get("hidden_act", "relu2"),
            rope_scaling=cfg.get("rope_scaling"),
            parallel_residual=False,
            rotary_dim=int(hd * cfg.get("partial_rotary_factor", 0.5)),
            qkv_layout="neox_fused",
        )
    if mt == "dbrx":
        # canonicalized by models/dbrx.DbrxReader into the mixtral-shaped
        # layout: fused global-concat qkv_proj (+optional clip), LayerNorm
        # (no bias), softmax top-k router with L1 weight normalization
        # (modeling_dbrx.py:206-618)
        h = cfg["d_model"]
        nh = cfg["n_heads"]
        attn_cfg = cfg.get("attn_config") or {}
        ffn_cfg = cfg.get("ffn_config") or {}
        return ModelSpec(
            model_type=mt,
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=ffn_cfg.get("ffn_hidden_size", 4 * h),
            num_layers=cfg["n_layers"],
            num_heads=nh,
            num_kv_heads=attn_cfg.get("kv_n_heads", nh),
            head_dim=h // nh,
            norm_type="ln",
            rms_norm_eps=1e-5,
            rope_theta=attn_cfg.get("rope_theta", 10000.0),
            max_position_embeddings=cfg.get("max_seq_len", 2048),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            hidden_act=(ffn_cfg.get("ffn_act_fn") or {}).get("name", "silu"),
            clip_qkv=float(attn_cfg.get("clip_qkv") or 0.0),
            num_experts=ffn_cfg.get("moe_num_experts", 0),
            num_experts_per_tok=ffn_cfg.get("moe_top_k", 0),
            moe_intermediate_size=ffn_cfg.get("ffn_hidden_size", 0),
            norm_topk_prob=ffn_cfg.get("moe_normalize_expert_weights") is not None,
        )
    if mt == "mpt":
        # transformer.blocks.N.{norm_1, attn.Wqkv (global [q|k|v]), attn.
        # out_proj, norm_2, ffn.up_proj/down_proj}; exact GELU, MPT-style
        # ALiBi, no position embeddings (modeling_mpt.py:45-163)
        h = cfg["d_model"]
        nh = cfg["n_heads"]
        attn_cfg = cfg.get("attn_config") or {}
        if attn_cfg.get("qk_ln"):
            raise NotImplementedError("mpt qk_ln not supported yet")
        return ModelSpec(
            model_type=mt,
            family="neox",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg.get("expansion_ratio", 4) * h,
            num_layers=cfg["n_layers"],
            num_heads=nh,
            num_kv_heads=nh,
            head_dim=h // nh,
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            max_position_embeddings=cfg.get("max_seq_len", 2048),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            hidden_act="gelu",
            parallel_residual=False,
            alibi=bool(attn_cfg.get("alibi", True)),
            clip_qkv=float(attn_cfg.get("clip_qkv") or 0.0),
        )
    if mt == "bamba":
        # hybrid: mamba2 mixers + GQA attention layers (attn_layer_indices),
        # shared gated MLP, partial rotary (modeling_bamba.py:978)
        h = cfg["hidden_size"]
        heads = cfg["num_attention_heads"]
        hd = cfg.get("attn_rotary_emb") or h // heads
        attn_idx = set(cfg.get("attn_layer_indices") or [])
        d_inner = int(cfg.get("mamba_expand", 2)) * h
        return ModelSpec(
            model_type=mt,
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg.get("intermediate_size", 4 * h),
            num_layers=cfg["num_hidden_layers"],
            num_heads=heads,
            num_kv_heads=cfg.get("num_key_value_heads", heads),
            head_dim=h // heads,
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            rope_theta=cfg.get("rope_theta", 10000.0),
            max_position_embeddings=cfg.get("max_position_embeddings", 4096),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            hidden_act=cfg.get("hidden_act", "silu"),
            attention_bias=cfg.get("attention_bias", False),
            mlp_bias=cfg.get("mlp_bias", False),
            rotary_dim=int((h // heads) * cfg.get("partial_rotary_factor", 0.5)),
            layers_block_type=tuple(
                "attention" if i in attn_idx else "mamba"
                for i in range(cfg["num_hidden_layers"])
            ),
            mamba_d_inner=d_inner,
            mamba_d_state=cfg.get("mamba_d_state", 128),
            mamba_d_conv=cfg.get("mamba_d_conv", 4),
            mamba_n_heads=cfg.get("mamba_n_heads", d_inner // 64),
            mamba_n_groups=cfg.get("mamba_n_groups", 1),
        )
    if mt == "falcon_h1":
        # EVERY layer runs mamba2 and attention IN PARALLEL on the same
        # normed input, each with mup multipliers; the SSM in_proj is
        # rescaled by a per-span mup vector (modeling_falcon_h1.py:1046-1135,
        # compute_mup_vector :1172)
        h = cfg["hidden_size"]
        heads = cfg["num_attention_heads"]
        hd = cfg.get("head_dim") or h // heads
        d_ssm = cfg.get("mamba_d_ssm") or int(cfg.get("mamba_expand", 2) * h)
        mlp_mults = cfg.get("mlp_multipliers") or (1.0, 1.0)
        return ModelSpec(
            model_type=mt,
            falcon_h1=True,
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg.get("intermediate_size", 4 * h),
            num_layers=cfg["num_hidden_layers"],
            num_heads=heads,
            num_kv_heads=cfg.get("num_key_value_heads", heads),
            head_dim=hd,
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            rope_theta=cfg.get("rope_theta", 100000.0),
            max_position_embeddings=cfg.get("max_position_embeddings", 4096),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            hidden_act=cfg.get("hidden_act", "silu"),
            attention_bias=cfg.get("attention_bias", False),
            mlp_bias=cfg.get("mlp_bias", False),
            rope_scaling=cfg.get("rope_scaling"),
            embedding_multiplier=float(cfg.get("embedding_multiplier") or 1.0),
            logit_scale=float(cfg.get("lm_head_multiplier") or 1.0),
            key_multiplier=float(cfg.get("key_multiplier") or 0.0),
            fh1_multipliers=(
                float(cfg.get("attention_in_multiplier") or 1.0),
                float(cfg.get("attention_out_multiplier") or 1.0),
                float(cfg.get("ssm_in_multiplier") or 1.0),
                float(cfg.get("ssm_out_multiplier") or 1.0),
                float(mlp_mults[0]), float(mlp_mults[1]),
            ),
            fh1_ssm_multipliers=tuple(
                float(v) for v in (cfg.get("ssm_multipliers") or (1.0,) * 5)
            ),
            mamba_norm_before_gate=cfg.get("mamba_norm_before_gate", True),
            mamba_d_inner=d_ssm,
            mamba_d_state=cfg.get("mamba_d_state", 128),
            mamba_d_conv=cfg.get("mamba_d_conv", 4),
            mamba_n_heads=cfg.get("mamba_n_heads", d_ssm // 64),
            mamba_n_groups=cfg.get("mamba_n_groups", 1),
            mamba_dt_limit=tuple(
                cfg.get("time_step_limit") or (0.0, float("inf"))
            ),
        )
    if mt == "mamba2":
        # SSD mixer: fused in_proj [gate|x+B+C|dt], scalar A per head,
        # grouped B/C, gated RMSNorm (modeling_mamba2.py:222)
        h = cfg["hidden_size"]
        d_inner = int(cfg.get("expand", 2)) * h
        return ModelSpec(
            model_type=mt,
            family="mamba",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=d_inner,
            num_layers=cfg["num_hidden_layers"],
            num_heads=1,
            num_kv_heads=1,
            head_dim=8,  # unused (no attention)
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            hidden_act=cfg.get("hidden_act", "silu"),
            mamba_d_inner=d_inner,
            mamba_d_state=cfg.get("state_size", 128),
            mamba_d_conv=cfg.get("conv_kernel", 4),
            mamba_n_heads=cfg.get("num_heads", d_inner // 64),
            mamba_n_groups=cfg.get("n_groups", 1),
            mamba_dt_limit=tuple(cfg.get("time_step_limit", (0.0, float("inf")))),
        )
    if mt in ("falcon_mamba", "mamba"):
        # pure selective-SSM stack (no attention): backbone.layers.N.{norm,
        # mixer.{in_proj, conv1d, x_proj, dt_proj, A_log, D, out_proj}}
        h = cfg["hidden_size"]
        d_inner = cfg.get("intermediate_size") or int(cfg.get("expand", 2)) * h
        import math as _math

        dtr = cfg.get("time_step_rank")
        if dtr in (None, "auto"):
            dtr = _math.ceil(h / 16)
        return ModelSpec(
            model_type=mt,
            family="mamba",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=d_inner,
            num_layers=cfg["num_hidden_layers"],
            num_heads=1,
            num_kv_heads=1,
            head_dim=8,  # unused (no attention); keeps rope helpers happy
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            hidden_act=cfg.get("hidden_act", "silu"),
            mamba_d_inner=d_inner,
            mamba_d_state=cfg.get("state_size", 16),
            mamba_d_conv=cfg.get("conv_kernel", 4),
            mamba_dt_rank=int(dtr),
            mixer_rms_eps=(
                cfg.get("mixer_rms_eps", 1e-6) if mt == "falcon_mamba" else 0.0
            ),
        )
    if mt == "bloom":
        h = cfg.get("hidden_size", cfg.get("n_embed"))
        nh = cfg.get("n_head", cfg.get("num_attention_heads"))
        return ModelSpec(
            model_type=mt,
            family="bloom",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=4 * h,
            num_layers=cfg.get("n_layer", cfg.get("num_hidden_layers")),
            num_heads=nh,
            num_kv_heads=nh,
            head_dim=h // nh,
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            hidden_act="gelu_pytorch_tanh",  # bloom's exact-tanh gelu
            apply_residual_post_ln=cfg.get(
                "apply_residual_connection_post_layernorm", False
            ),
        )
    if "num_hidden_layers" not in cfg and "num_layers" in cfg:
        cfg = {**cfg, "num_hidden_layers": cfg["num_layers"]}  # exaone
    if "vocab_size" not in cfg and "padded_vocab_size" in cfg:
        cfg = {**cfg, "vocab_size": cfg["padded_vocab_size"]}  # chatglm
    if "num_attention_heads" not in cfg and "n_head" in cfg:
        cfg = {**cfg, "num_attention_heads": cfg["n_head"]}  # telechat
    if "num_attention_heads" not in cfg and "num_heads" in cfg:
        cfg = {**cfg, "num_attention_heads": cfg["num_heads"]}  # hrm_text
    if "num_hidden_layers" not in cfg and "n_layer" in cfg:
        cfg = {**cfg, "num_hidden_layers": cfg["n_layer"]}
    if "num_hidden_layers" not in cfg and ("L_layers" in cfg or "H_layers" in cfg):
        cfg = {**cfg, "num_hidden_layers": int(cfg.get("L_layers") or 0)
               + int(cfg.get("H_layers") or 0)}  # hrm_text dual stacks
    hidden = cfg["hidden_size"]
    heads = cfg["num_attention_heads"]
    head_dim = cfg.get("head_dim") or hidden // heads

    common = dict(
        model_type=mt,
        vocab_size=cfg["vocab_size"],
        hidden_size=hidden,
        intermediate_size=cfg.get("intermediate_size", 4 * hidden),
        num_layers=cfg["num_hidden_layers"],
        num_heads=heads,
        num_kv_heads=cfg.get("num_key_value_heads", heads),
        head_dim=head_dim,
        rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
        rope_theta=cfg.get("rope_theta", 10000.0),
        max_position_embeddings=cfg.get("max_position_embeddings", 4096),
        tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        hidden_act=cfg.get("hidden_act", cfg.get("hidden_activation", "silu")),
        attention_bias=cfg.get("attention_bias", cfg.get("qkv_bias", False)),
        mlp_bias=cfg.get("mlp_bias", False),
        rope_scaling=cfg.get("rope_scaling"),
        sliding_window=cfg.get("sliding_window") or 0,
        layer_types=tuple(cfg.get("layer_types") or ()),
    )

    bc = cfg.get("block_configs")
    if bc:
        # decilm / nemotron-nas NAS blocks (reference definitions/decilm.py;
        # DeciLM remote code): per-layer attention GQA via n_heads_in_group,
        # no_op / replace_with_linear sublayers (presence-driven in the
        # forward — 0 kv heads marks an attention-free layer)
        common.update(layer_kv_heads=tuple(
            0 if a.get("no_op") or a.get("replace_with_linear")
            or not a.get("n_heads_in_group")
            else heads // int(a["n_heads_in_group"])
            for a in ((b.get("attention") or {}) for b in bc)
        ))

    if mt == "qwen3" or mt == "qwen3_moe":
        common["qk_norm"] = True
    if mt in ("qwen2", "qwen2_moe"):
        common["attention_bias"] = True  # qwen2 has qkv bias w/o config flag

    if mt in ("qwen3_moe", "qwen2_moe"):
        common.update(
            num_experts=cfg.get("num_experts", 0),
            num_experts_per_tok=cfg.get("num_experts_per_tok", 0),
            moe_intermediate_size=cfg.get("moe_intermediate_size", 0),
            norm_topk_prob=cfg.get("norm_topk_prob", mt == "qwen3_moe"),
        )
    if mt == "mixtral":
        common.update(
            num_experts=cfg.get("num_local_experts", 0),
            num_experts_per_tok=cfg.get("num_experts_per_tok", 2),
            moe_intermediate_size=cfg.get("intermediate_size", 0),
            norm_topk_prob=True,
        )
    if mt == "phimoe":
        # phi-3.5-MoE: LayerNorm decoder norms, sparsemixer top-2 routing
        # (modeling_phimoe.py:605,813), mixtral w1/w3/w2 expert layout
        common.update(
            norm_type="ln",
            num_experts=cfg.get("num_local_experts", 0),
            num_experts_per_tok=2,
            moe_intermediate_size=cfg.get("intermediate_size", 0),
            moe_scoring="sparsemixer",
            router_jitter=float(cfg.get("router_jitter_noise") or 0.0),
            attention_bias=cfg.get("attention_bias", True),
        )
    if mt in ("gemma", "gemma2"):
        common.update(
            embedding_multiplier=float(hidden) ** 0.5,
            rms_norm_offset=True,
        )
    if mt == "gemma2":
        common.update(
            post_norms=True,
            logit_softcap=cfg.get("final_logit_softcapping", 0.0) or 0.0,
            attn_softcap=cfg.get("attn_logit_softcapping", 0.0) or 0.0,
            query_pre_attn_scalar=cfg.get("query_pre_attn_scalar", 0.0) or 0.0,
        )
    if mt in ("deepseek_v2", "deepseek_v3"):
        # MLA: q/k head dim = nope + rope parts; v has its own dim; rope
        # applies only to the rope slice (dim qk_rope_head_dim); KV "heads"
        # are the expanded per-head k/v (latent-cache optimization is a
        # runtime concern, not a spec one)
        qk_rope = cfg.get("qk_rope_head_dim", 64)
        qk_nope = cfg.get("qk_nope_head_dim", 128)
        common.update(
            mla=True,
            head_dim=qk_nope + qk_rope,
            num_kv_heads=heads,
            q_lora_rank=cfg.get("q_lora_rank") or 0,
            kv_lora_rank=cfg.get("kv_lora_rank") or 0,
            qk_rope_head_dim=qk_rope,
            qk_nope_head_dim=qk_nope,
            v_head_dim=cfg.get("v_head_dim", 128),
            num_experts=cfg.get("n_routed_experts") or 0,
            num_experts_per_tok=cfg.get("num_experts_per_tok") or 0,
            moe_intermediate_size=cfg.get("moe_intermediate_size", 0),
            norm_topk_prob=cfg.get("norm_topk_prob", False),
            n_shared_experts=cfg.get("n_shared_experts") or 0,
            first_k_dense_replace=cfg.get("first_k_dense_replace", 0),
            moe_topk_method=cfg.get(
                "topk_method", "noaux_tc" if mt == "deepseek_v3" else "greedy"
            ),
            moe_scoring=cfg.get(
                "scoring_func", "sigmoid" if mt == "deepseek_v3" else "softmax"
            ),
            n_group=cfg.get("n_group") or 0,
            topk_group=cfg.get("topk_group") or 0,
            routed_scaling_factor=cfg.get("routed_scaling_factor", 1.0),
            rope_interleave=cfg.get("rope_interleave", True),
        )
    if mt in ("cohere", "cohere2", "cohere2_moe"):
        # CohereLayerNorm (mean-centered, weight, no bias), shared-ln
        # parallel residual, interleaved rope, scaled logits, tied embeds
        # (modeling_cohere.py:51,323-338,498)
        common.update(
            norm_type="ln",
            rms_norm_eps=cfg.get("layer_norm_eps", 1e-5),
            parallel_residual=True,
            rope_interleave=True,
            logit_scale=cfg.get("logit_scale", 0.0625),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            qk_norm_ln=bool(cfg.get("use_qk_norm", False)),
        )
        if mt in ("cohere2", "cohere2_moe"):
            # full-attention layers skip RoPE (modeling_cohere2.py:217)
            common["rope_sliding_only"] = True
            if not common["layer_types"]:
                pat = cfg.get("sliding_window_pattern", 4)
                common["layer_types"] = tuple(
                    "full_attention" if (i + 1) % pat == 0
                    else "sliding_attention"
                    for i in range(cfg["num_hidden_layers"])
                )
    if mt == "olmo":
        # non-parametric LayerNorm + optional qkv clamp (modeling_olmo.py:28,174)
        common.update(
            norm_type="ln_np",
            rms_norm_eps=1e-5,
            clip_qkv=float(cfg.get("clip_qkv") or 0.0),
        )
    if mt == "olmo2":
        # norms on sublayer outputs only; full-width q/k RMSNorm
        # (modeling_olmo2.py:149-166,250-257)
        common.update(norm_after=True, qk_norm_wide=True)
    if mt == "olmo3":
        # olmo2 body + sliding/full layer_types; sliding layers use the
        # UNSCALED default rope (modeling_olmo3.py:48-53 per-type rotary)
        common.update(norm_after=True, qk_norm_wide=True)
        if common.get("rope_scaling") and common.get("layer_types"):
            common["rope_local_theta"] = common["rope_theta"]
    if mt == "flex_olmo":
        # olmo2-style post-only norms + wide q/k norm, olmoe-style MoE
        # (modeling_flex_olmo.py:314-360)
        common.update(
            norm_after=True,
            qk_norm_wide=True,
            num_experts=cfg.get("num_experts", 0),
            num_experts_per_tok=cfg.get("num_experts_per_tok", 0),
            moe_intermediate_size=cfg.get("intermediate_size", 0),
            norm_topk_prob=cfg.get("norm_topk_prob", False),
        )
    if mt == "vaultgemma":
        # gemma2 attention (query_pre_attn_scalar, softcaps, rms offset)
        # with PLAIN pre-norms: input_layernorm + pre_feedforward_layernorm,
        # no post norms (modeling_vaultgemma.py:238-280)
        common.update(
            embedding_multiplier=float(hidden) ** 0.5,
            rms_norm_offset=True,
            query_pre_attn_scalar=cfg.get("query_pre_attn_scalar", 0.0) or 0.0,
            attn_softcap=cfg.get("attn_logit_softcapping", 0.0) or 0.0,
            logit_softcap=cfg.get("final_logit_softcapping", 0.0) or 0.0,
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
        )
    if mt == "granitemoeshared":
        # granitemoe + always-on fused shared MLP (input_linear/output_linear
        # split by the granitemoe reader); same mup multipliers
        common.update(
            embedding_multiplier=cfg.get("embedding_multiplier", 1.0),
            attn_scale=cfg.get("attention_multiplier", 0.0) or 0.0,
            residual_multiplier=cfg.get("residual_multiplier", 1.0),
            logit_scale=1.0 / (cfg.get("logits_scaling", 1.0) or 1.0),
            num_experts=cfg.get("num_local_experts", 0),
            num_experts_per_tok=cfg.get("num_experts_per_tok", 2),
            moe_intermediate_size=cfg.get("intermediate_size", 0),
            moe_scoring="topk_softmax",
            norm_topk_prob=False,
        )
    if mt == "olmoe":
        # olmo2-style wide q/k norm, standard pre-norms, 64-expert top-8 MoE
        # (modeling_olmoe.py:286-307,581)
        common.update(
            qk_norm_wide=True,
            clip_qkv=float(cfg.get("clip_qkv") or 0.0),
            num_experts=cfg.get("num_experts", 0),
            num_experts_per_tok=cfg.get("num_experts_per_tok", 0),
            moe_intermediate_size=cfg.get("intermediate_size", 0),
            norm_topk_prob=cfg.get("norm_topk_prob", False),
        )
    if mt == "starcoder2":
        # LayerNorm+bias, biased projections, plain c_fc/c_proj MLP
        # (modeling_starcoder2.py:57-65,154-157,216)
        common.update(
            norm_type="ln",
            rms_norm_eps=cfg.get("norm_epsilon", 1e-5),
            attention_bias=cfg.get("use_bias", True),
            mlp_bias=cfg.get("use_bias", True),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
        )
    if mt == "granite":
        # llama + the four mup-style multipliers (modeling_granite.py:127,
        # 288, 373, logits/logits_scaling)
        common.update(
            embedding_multiplier=cfg.get("embedding_multiplier", 1.0),
            attn_scale=cfg.get("attention_multiplier", 0.0) or 0.0,
            residual_multiplier=cfg.get("residual_multiplier", 1.0),
            logit_scale=1.0 / (cfg.get("logits_scaling", 1.0) or 1.0),
        )
    if mt == "exaone4":
        # post-only norms + per-head q/k RMSNorm; hybrid layouts skip RoPE
        # on full-attention layers (modeling_exaone4.py:201-227,276-313)
        common.update(norm_after=True, qk_norm=True)
        if cfg.get("sliding_window"):
            common["rope_sliding_only"] = True
            if not common["layer_types"]:
                pat = cfg.get("sliding_window_pattern", 4)
                common["layer_types"] = tuple(
                    "full_attention" if (i + 1) % pat == 0
                    else "sliding_attention"
                    for i in range(cfg["num_hidden_layers"])
                )
    if mt in ("ernie4_5", "ernie4_5_moe"):
        # llama-shaped with a single use_bias knob and tied embeddings; the
        # MoE variant routes softmax + moe_statics correction bias, shared
        # experts, dense layers before moe_layer_start_index
        # (modeling_ernie4_5_moe.py:264-346)
        common.update(
            attention_bias=cfg.get("use_bias", False),
            mlp_bias=cfg.get("use_bias", False),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            rope_interleave=True,  # glm-style pairs (modeling_ernie4_5.py:96)
        )
        if mt == "ernie4_5_moe":
            common.update(
                num_experts=cfg.get("moe_num_experts") or 0,
                num_experts_per_tok=cfg.get("moe_k") or 0,
                moe_intermediate_size=cfg.get("moe_intermediate_size", 0),
                norm_topk_prob=True,
                n_shared_experts=cfg.get("moe_num_shared_experts") or 0,
                first_k_dense_replace=cfg.get("moe_layer_start_index", 0),
                moe_topk_method="noaux_tc",
                moe_scoring="softmax",
            )
    if mt == "smollm3":
        # every Nth layer is NoPE (no_rope_layers: 1=rope, 0=skip)
        nr = cfg.get("no_rope_layers")
        if nr is None:
            iv = cfg.get("no_rope_layer_interval", 4)
            nr = [0 if (i + 1) % iv == 0 else 1
                  for i in range(cfg["num_hidden_layers"])]
        common["no_rope_layers"] = tuple(int(v) for v in nr)
    if mt == "internlm2":
        # remote-code arch; canonicalized by models/remap (tok_embeddings/
        # output/attention.wqkv/wo/feed_forward.w*). The fused wqkv is
        # GROUPED per kv-head: [nkv, q_per_group + 2, hd]
        common.update(
            attention_bias=cfg.get("bias", False),
            mlp_bias=False,
            qkv_layout="grouped",
        )
    if mt == "baichuan":
        # remote-code arch; W_pack -> canonical fused qkv (global concat).
        # 13B-class checkpoints use ALiBi — not wired into the llama-family
        # attention yet
        if str(cfg.get("position_embedding", "")).upper() == "ALIBI":
            raise NotImplementedError("baichuan ALiBi variant not supported yet")
        common.update(attention_bias=False)
    if mt == "exaone":
        # remote-code EXAONE-3.x: llama body with num_layers /
        # activation_function / layer_norm_epsilon field names (renamed to
        # canonical llama tensors by models/remap.wrap_exaone_reader)
        common.update(
            num_layers=cfg.get("num_layers", cfg.get("num_hidden_layers")),
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            hidden_act=cfg.get("activation_function", "silu"),
        )
    if mt == "mimo":
        # Xiaomi MiMo (remote code): qwen2 body (biased qkv in checkpoint)
        # + MTP layers under model.mtp_layers that pass through dense
        # (reference definitions/mimo.py subclasses LlamaQModel)
        pass
    if mt == "minicpm3":
        # remote-code MiniCPM3: deepseek-style MLA (same tensor names,
        # interleaved-pair rope from the deepseek code lineage) + minicpm
        # mup multipliers (reference definitions/minicpm3.py tree)
        L = cfg["num_hidden_layers"]
        qk_rope = cfg.get("qk_rope_head_dim", 32)
        qk_nope = cfg.get("qk_nope_head_dim", 64)
        common.update(
            mla=True,
            head_dim=qk_nope + qk_rope,
            num_kv_heads=heads,
            q_lora_rank=cfg.get("q_lora_rank") or 0,
            kv_lora_rank=cfg.get("kv_lora_rank") or 0,
            qk_rope_head_dim=qk_rope,
            qk_nope_head_dim=qk_nope,
            v_head_dim=cfg.get("v_head_dim") or qk_nope,
            rope_interleave=cfg.get("rope_interleave", True),
            embedding_multiplier=float(cfg.get("scale_emb", 1.0)),
            residual_multiplier=float(cfg.get("scale_depth", float(L) ** 0.5))
            / float(L) ** 0.5,
            logit_scale=1.0 / (
                cfg["hidden_size"] / float(cfg.get("dim_model_base")
                                           or cfg["hidden_size"])
            ),
        )
    if mt == "minicpm":
        # remote-code arch, llama tensor names + mup-style factors:
        # scale_emb on embeddings, scale_depth/sqrt(L) on residuals,
        # hidden/dim_model_base dividing the logits
        L = cfg["num_hidden_layers"]
        common.update(
            embedding_multiplier=float(cfg.get("scale_emb", 1.0)),
            residual_multiplier=float(cfg.get("scale_depth", float(L) ** 0.5))
            / float(L) ** 0.5,
            logit_scale=1.0 / (
                cfg["hidden_size"] / float(cfg.get("dim_model_base")
                                           or cfg["hidden_size"])
            ),
        )
    if mt == "helium":
        # kyutai helium: llama body with glm-style interleaved rope
        # (modeling_helium.py:154-189)
        common["rope_interleave"] = True
    if mt == "nemotron":
        # LayerNorm1P ((1+w) affine), non-gated relu2 MLP, partial rotary
        # (modeling_nemotron.py:69-87,170-181,219)
        common.update(
            norm_type="ln1p",
            rms_norm_eps=cfg.get("norm_eps", 1e-5),
            rotary_dim=int(head_dim * cfg.get("partial_rotary_factor", 0.5)),
        )
    if mt == "hunyuan_v1_dense":
        # llama + per-head q/k RMSNorm under query/key_layernorm names
        common["qk_norm"] = True
    if mt == "hunyuan_v1_moe":
        # hunyuan attention + mixtral-style softmax->topk->renorm routing,
        # always-on ungated shared_mlp; experts and shared MLP both use
        # intermediate_size; gate Linear is nested as gate.wg
        # (modeling_hunyuan_v1_moe.py:231-302)
        ne, tk = cfg.get("num_experts", 1), cfg.get("moe_topk", 1)
        if isinstance(ne, list):
            if len(set(ne)) != 1:
                raise NotImplementedError("hunyuan per-layer expert counts")
            ne = ne[0]
        if isinstance(tk, list):
            if len(set(tk)) != 1:
                raise NotImplementedError("hunyuan per-layer moe_topk")
            tk = tk[0]
        common.update(
            qk_norm=True,
            num_experts=int(ne),
            num_experts_per_tok=int(tk),
            moe_intermediate_size=cfg.get("intermediate_size", 0),
            norm_topk_prob=True,
        )
    if mt == "dots1":
        # rednote dots.llm1: deepseek-v3 router (sigmoid + noaux_tc
        # correction bias + group-limited top-k) WITHOUT MLA — standard GQA
        # with per-head q/k RMSNorm — plus qwen-style sliding layer_types
        # (modeling_dots1.py:173-360)
        common.update(
            qk_norm=True,
            num_experts=cfg.get("n_routed_experts") or 0,
            num_experts_per_tok=cfg.get("num_experts_per_tok") or 0,
            moe_intermediate_size=cfg.get("moe_intermediate_size", 0),
            norm_topk_prob=cfg.get("norm_topk_prob", True),
            n_shared_experts=cfg.get("n_shared_experts") or 0,
            first_k_dense_replace=cfg.get("first_k_dense_replace", 0),
            moe_topk_method="noaux_tc",
            moe_scoring="sigmoid",
            n_group=cfg.get("n_group") or 0,
            topk_group=cfg.get("topk_group") or 0,
            routed_scaling_factor=cfg.get("routed_scaling_factor", 1.0),
        )
    if mt == "apertus":
        # per-head q/k RMSNorm + non-gated xIELU MLP (modeling_apertus.py:43,
        # 186-213); the learnable act params live under mlp.act_fn
        common["qk_norm"] = True
    # seed_oss / arcee / bitnet need no flags: biases and sub-norms are
    # presence-driven from the checkpoint (modeling_seed_oss.py:158
    # attention_out_bias, modeling_arcee.py:50 non-gated relu2,
    # modeling_bitnet.py:74,178 sub_norms)
    if mt in ("glm", "glm4", "glm4_moe"):
        # partial (factor 0.5) pair-interleaved rotary (modeling_glm.py:134),
        # fused gate_up MLP; glm4 adds sandwich norms
        # (modeling_glm4.py:75-111); glm4_moe is a deepseek-v3-style router
        # (sigmoid + noaux_tc correction bias, modeling_glm4_moe.py:260-271)
        common.update(
            rotary_dim=int(head_dim * cfg.get("partial_rotary_factor", 0.5)),
            # glm/glm4 rotate interleaved pairs; glm4_moe uses the standard
            # rotate-half convention (modeling_glm4_moe.py:83)
            rope_interleave=mt != "glm4_moe",
            attention_bias=cfg.get("attention_bias", mt != "glm4_moe"),
        )
        if mt == "glm4":
            common["post_norms"] = True  # glm4 norm names handled in layer
        if mt == "glm4_moe":
            common.update(
                qk_norm=bool(cfg.get("use_qk_norm", False)),
                num_experts=cfg.get("n_routed_experts") or 0,
                num_experts_per_tok=cfg.get("num_experts_per_tok") or 0,
                moe_intermediate_size=cfg.get("moe_intermediate_size", 0),
                norm_topk_prob=cfg.get("norm_topk_prob", True),
                n_shared_experts=cfg.get("n_shared_experts") or 0,
                first_k_dense_replace=cfg.get("first_k_dense_replace", 0),
                moe_topk_method="noaux_tc",
                moe_scoring="sigmoid",
                n_group=cfg.get("n_group") or 0,
                topk_group=cfg.get("topk_group") or 0,
                routed_scaling_factor=cfg.get("routed_scaling_factor", 1.0),
            )
    if mt == "jamba":
        # NoPE attention + mamba1 (weighted dt/B/C norms) hybrid with
        # periodic mixtral-style MoE layers (modeling_jamba.py:593-1000)
        L = cfg["num_hidden_layers"]
        ap, ao = cfg.get("attn_layer_period", 8), cfg.get("attn_layer_offset", 4)
        h = cfg["hidden_size"]
        d_inner = int(cfg.get("mamba_expand", 2)) * h
        dtr = cfg.get("mamba_dt_rank")
        if dtr in (None, "auto"):
            import math as _math

            dtr = _math.ceil(h / 16)
        common.update(
            no_rope_layers=(0,) * L,
            layers_block_type=tuple(
                "attention" if i % ap == ao else "mamba" for i in range(L)
            ),
            num_experts=cfg.get("num_experts", 0),
            num_experts_per_tok=cfg.get("num_experts_per_tok", 2),
            moe_intermediate_size=cfg.get("intermediate_size", 0),
            norm_topk_prob=False,
            mamba_d_inner=d_inner,
            mamba_d_state=cfg.get("mamba_d_state", 16),
            mamba_d_conv=cfg.get("mamba_d_conv", 4),
            mamba_dt_rank=int(dtr),
        )
    if mt in ("granitemoe", "granitemoehybrid"):
        # granite mup multipliers + topk-softmax MoE with fused parallel
        # experts (split by models/remap.GraniteMoeReader); the hybrid adds
        # mamba2 layers, an always-on fused shared MLP and defaults to NoPE
        # (modeling_granitemoehybrid.py:1110-1205)
        L = cfg["num_hidden_layers"]
        common.update(
            embedding_multiplier=cfg.get("embedding_multiplier", 1.0),
            attn_scale=cfg.get("attention_multiplier", 0.0) or 0.0,
            residual_multiplier=cfg.get("residual_multiplier", 1.0),
            logit_scale=1.0 / (cfg.get("logits_scaling", 1.0) or 1.0),
            num_experts=cfg.get("num_local_experts", 0),
            num_experts_per_tok=cfg.get("num_experts_per_tok", 2),
            moe_intermediate_size=cfg.get("intermediate_size", 0),
            moe_scoring="topk_softmax",
            norm_topk_prob=False,
        )
        if mt == "granitemoehybrid":
            d_inner = int(cfg.get("mamba_expand", 2)) * cfg["hidden_size"]
            lbt = cfg.get("layer_types") or ["mamba"] * L
            common.update(
                layers_block_type=tuple(lbt),
                layer_types=(),
                mamba_d_inner=d_inner,
                mamba_d_state=cfg.get("mamba_d_state", 128),
                mamba_d_conv=cfg.get("mamba_d_conv", 4),
                mamba_n_heads=cfg.get("mamba_n_heads", d_inner // 64),
                mamba_n_groups=cfg.get("mamba_n_groups", 1),
            )
            if cfg.get("position_embedding_type") != "rope":
                common["no_rope_layers"] = (0,) * L
    if mt == "lfm2":
        # attention layers (per-head q/k RMS) interleaved with gated short
        # convolutions (modeling_lfm2.py:417-575); w1/w3/w2 MLP
        common.update(
            qk_norm=True,
            rms_norm_eps=cfg.get("norm_eps", 1e-5),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            mamba_d_conv=cfg.get("conv_L_cache", 3),
            layers_block_type=tuple(
                "attention" if t == "full_attention" else "conv"
                for t in (cfg.get("layer_types") or [])
            ),
            layer_types=(),  # conv layers are not sliding-attention layers
        )
    if mt in ("llama4", "llama4_text"):
        # interleaved rope (complex freqs_cis form), L2 qk-norm after rope,
        # NoPE layers with q temperature tuning + full attention, chunked
        # causal attention on rope layers, top-k sigmoid INPUT-scaled MoE
        # with fused experts (split by models/remap.Llama4Reader) + shared
        # expert (modeling_llama4.py:46-165,279-347)
        nr = cfg.get("no_rope_layers")
        if not nr:
            iv = cfg.get("no_rope_layer_interval", 4)
            nr = [0 if (i + 1) % iv == 0 else 1
                  for i in range(cfg["num_hidden_layers"])]
        common.update(
            rope_interleave=True,
            qk_norm_l2=bool(cfg.get("use_qk_norm", True)),
            no_rope_layers=tuple(int(v) for v in nr),
            attn_temp_tuning=bool(cfg.get("attn_temperature_tuning", False)),
            attn_temp_floor=float(cfg.get("floor_scale", 8192)),
            attn_temp_scale=float(cfg.get("attn_scale", 0.1)),
            attention_chunk_size=int(cfg.get("attention_chunk_size") or 0),
            num_experts=cfg.get("num_local_experts", 0),
            num_experts_per_tok=cfg.get("num_experts_per_tok", 1),
            moe_intermediate_size=cfg.get("intermediate_size", 0),
            moe_scoring="llama4",
            moe_input_scaled=True,
            norm_topk_prob=False,
        )
    if mt == "longcat_flash":
        # dual-sublayer layers (2 MLA attns + 2 dense MLPs + shortcut MoE
        # with zero/identity experts); MLA carries lora mup scalings
        # (modeling_longcat_flash.py:288-500)
        qk_rope = cfg.get("qk_rope_head_dim", 64)
        qk_nope = cfg.get("qk_nope_head_dim", 128)
        qlr = cfg.get("q_lora_rank") or 0
        kvlr = cfg.get("kv_lora_rank") or 0
        common.update(
            longcat=True,
            # num_hidden_layers counts SUBLAYERS (2 per logical layer);
            # num_layers is the logical decoder-layer count
            num_layers=cfg.get("num_layers")
            or cfg["num_hidden_layers"] // 2,
            mla=True,
            head_dim=qk_nope + qk_rope,
            num_kv_heads=heads,
            q_lora_rank=qlr,
            kv_lora_rank=kvlr,
            qk_rope_head_dim=qk_rope,
            qk_nope_head_dim=qk_nope,
            v_head_dim=cfg.get("v_head_dim", 128),
            rope_interleave=True,
            mla_scale_q_lora=(hidden / qlr) ** 0.5 if qlr else 0.0,
            mla_scale_kv_lora=(hidden / kvlr) ** 0.5 if kvlr else 0.0,
            num_experts=(cfg.get("n_routed_experts") or 0)
            + (cfg.get("zero_expert_num") or 0),
            zero_expert_num=cfg.get("zero_expert_num") or 0,
            num_experts_per_tok=cfg.get("moe_topk", 0),
            moe_intermediate_size=cfg.get("expert_ffn_hidden_size", 0),
            routed_scaling_factor=cfg.get("routed_scaling_factor", 1.0),
            norm_topk_prob=False,
        )
    if mt == "minimax":
        # MiniMax-Text-01/M1 hybrid: lightning (linear) attention layers
        # with per-head layer-indexed decay slopes, sigmoid output gate and
        # full-width RMSNorm; mixtral-style top-k MoE; residuals use the
        # NORMED hidden with per-kind alpha/beta factors
        # (modeling_minimax.py:118-575)
        lt = cfg.get("layer_types") or ()
        common.update(
            minimax_residual=True,
            minimax_factors=(
                float(cfg.get("full_attn_alpha_factor", 1.0)),
                float(cfg.get("full_attn_beta_factor", 1.0)),
                float(cfg.get("linear_attn_alpha_factor", 1.0)),
                float(cfg.get("linear_attn_beta_factor", 1.0)),
                float(cfg.get("mlp_alpha_factor", 1.0)),
                float(cfg.get("mlp_beta_factor", 1.0)),
            ),
            layers_block_type=tuple(
                "lightning" if t == "linear_attention" else "attention"
                for t in lt
            ),
            layer_types=(),
            num_experts=cfg.get("num_local_experts", 0),
            num_experts_per_tok=cfg.get("num_experts_per_tok", 2),
            moe_intermediate_size=cfg.get("intermediate_size", 0),
            norm_topk_prob=True,
        )
    if mt in ("qwen3_next", "qwen3_5_text", "qwen3_5_moe_text"):
        # hybrid GatedDeltaNet (linear_attention layers) + gated full
        # attention (q_proj doubles width for a sigmoid output gate,
        # partial rotary 0.25, per-head q/k RMSNorm) + qwen2_moe-style
        # sparse MoE with gated shared expert
        # (modeling_qwen3_next.py:321-400,564-776,794-857). qwen3_5
        # (reference definitions/qwen3_5.py / qwen3_5_moe.py) shares the
        # semantics but splits the deltanet projections into in_proj_qkv/
        # -z/-b/-a — the forward dispatches on which leaves are present.
        lt = cfg.get("layer_types") or ()
        common.update(
            qk_norm=True,
            attn_output_gate=True,
            # Qwen3NextRMSNorm is zero-centered: (1 + w) * normed
            # (modeling_qwen3_next.py:215-229); the deltanet's RMSNormGated
            # uses a plain ones-init weight
            rms_norm_offset=True,
            rotary_dim=int(head_dim * cfg.get("partial_rotary_factor", 0.25)),
            layer_types=(),  # linear layers are not sliding-attention
            layers_block_type=tuple(
                "linear" if t == "linear_attention" else "attention"
                for t in lt
            ),
            mamba_d_conv=cfg.get("linear_conv_kernel_dim", 4),
            linear_num_v_heads=cfg.get("linear_num_value_heads", 0),
            linear_num_k_heads=cfg.get("linear_num_key_heads", 0),
            linear_k_head_dim=cfg.get("linear_key_head_dim", 0),
            linear_v_head_dim=cfg.get("linear_value_head_dim", 0),
            num_experts=cfg.get("num_experts", 0),
            num_experts_per_tok=cfg.get("num_experts_per_tok", 0),
            moe_intermediate_size=cfg.get("moe_intermediate_size", 0),
            norm_topk_prob=cfg.get("norm_topk_prob", True),
        )
    if mt == "internlm":
        # internlm v1 remote code (reference definitions/internlm.py:
        # LlamaQModel subclass): llama body, qkv/o bias via config "bias"
        common.update(attention_bias=bool(cfg.get("bias", True)))
    if mt in ("telechat", "telechat2"):
        # TeleChat2 remote code (reference definitions/telechat2.py):
        # llama body under transformer.h with GPT-style config keys; the
        # fused per-head key_value is split by models/remap.TeleChatReader.
        # o_proj/down_proj biases (telechat quirk) load presence-driven.
        common.update(
            intermediate_size=cfg.get("ffn_hidden_size")
            or cfg.get("intermediate_size", 4 * hidden),
            max_position_embeddings=cfg.get("seq_length")
            or cfg.get("max_position_embeddings", 8192),
            rms_norm_eps=cfg.get("layer_norm_epsilon")
            or cfg.get("rms_norm_eps", 1e-5),
            tie_word_embeddings=bool(cfg.get("tie_word_embeddings", False)),
        )
        if "num_key_value_heads" not in cfg:
            common.update(num_kv_heads=heads)
    if mt == "hrm_text":
        # HRM text (reference definitions/hrm_text.py): dual L/H decoder
        # stacks (flattened by models/remap.wrap_hrm_reader); llama-shaped
        # blocks with a gated attention branch. Quantize-tree coverage; the
        # recurrent H/L schedule itself is out of forward scope.
        n_l = int(cfg.get("L_layers") or 0)
        n_h = int(cfg.get("H_layers") or 0)
        if n_l + n_h:
            common.update(num_layers=n_l + n_h)
    if mt == "gpt_oss":
        # attention sinks + sliding alternation + yarn rope + clamped-GLU
        # MoE with biased experts/router; fused expert tensors canonicalized
        # by models/remap.GptOssReader
        common.update(
            num_experts=cfg.get("num_local_experts", 0),
            num_experts_per_tok=cfg.get("num_experts_per_tok", 4),
            moe_intermediate_size=cfg.get("intermediate_size", 0),
            moe_scoring="topk_softmax",  # topk FIRST, softmax over top vals
            norm_topk_prob=False,
            glu_clamp_limit=float(cfg.get("swiglu_limit") or 7.0),
            attention_bias=cfg.get("attention_bias", True),
        )
    if mt in ("gemma3_text", "gemma3"):
        # gemma3: gemma2 norms + qk-norm + sliding/full alternation with a
        # SEPARATE rope base for sliding layers (rope_local_base_freq)
        common.update(
            embedding_multiplier=float(hidden) ** 0.5,
            rms_norm_offset=True,
            post_norms=True,
            qk_norm=True,
            query_pre_attn_scalar=cfg.get("query_pre_attn_scalar", 0.0) or 0.0,
            rope_local_theta=cfg.get("rope_local_base_freq", 10000.0),
        )
        if not common["layer_types"]:
            # older configs: sliding_window_pattern=N, every Nth layer full
            pat = cfg.get("sliding_window_pattern", 6)
            common["layer_types"] = tuple(
                "full_attention" if (i + 1) % pat == 0 else "sliding_attention"
                for i in range(cfg["num_hidden_layers"])
            )

    if mt == "mllama_text_model":
        # llama body; cross-attention layers (cross_attention_layers) carry
        # dense cross_attn + gates and are SKIPPED on text-only forward
        # (modeling_mllama.py MllamaTextModel.forward)
        common.update(
            skip_layers=tuple(cfg.get("cross_attention_layers") or ()),
        )
    if mt == "chatglm":
        # chatglm2/3 / glm-4 remote code (canonicalized to the glm family by
        # models/remap.wrap_chatglm_reader): RMSNorm, fused biased qkv, MQA
        # via multi_query_group_num, half-width pair-interleaved rotary,
        # fused swiglu; rope theta scales by rope_ratio
        kvh = (cfg.get("multi_query_group_num")
               if cfg.get("multi_query_attention") else heads) or heads
        hd = cfg.get("kv_channels") or head_dim
        common.update(
            num_layers=cfg.get("num_layers", cfg.get("num_hidden_layers", 0)),
            vocab_size=cfg.get("padded_vocab_size", cfg.get("vocab_size", 0)),
            intermediate_size=cfg.get(
                "ffn_hidden_size", cfg.get("intermediate_size", 4 * hidden)
            ),
            num_kv_heads=kvh,
            head_dim=hd,
            rms_norm_eps=cfg.get("layernorm_epsilon", 1e-5),
            rope_theta=10000.0 * float(cfg.get("rope_ratio") or 1.0),
            max_position_embeddings=cfg.get("seq_length", 8192),
            attention_bias=bool(cfg.get("add_qkv_bias", True)),
            rotary_dim=hd // 2,
            rope_interleave=True,
        )
    if mt == "qwen":
        # QWen-1 remote code (canonicalized by wrap_qwen1_reader): llama
        # body, fused biased c_attn, w1/w2 each intermediate_size//2 wide
        common.update(
            intermediate_size=cfg.get("intermediate_size", 4 * hidden) // 2,
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-6),
            rope_theta=cfg.get("rotary_emb_base", 10000.0),
            max_position_embeddings=cfg.get("seq_length", 8192),
            attention_bias=True,  # bias on the fused c_attn only
        )

    # ---- batch-3 MoE archs (no transformers-native oracle at our pin;
    # semantics are config-driven with deepseek/qwen-moe defaults — trees in
    # models/definitions.py cite the reference definitions/<mt>.py files) ----
    _DS_LIKE_MOE = {
        "klear", "hy_v3", "solar_open", "solar_open2", "bailing_moe",
        "bailing_hybrid", "llada2_moe", "mimo_v2", "glm4_moe_lite", "axk2",
        "deepseek_v4", "glm_moe_dsa", "inkling_mm_model", "kimi_k2",
    }
    if mt in _DS_LIKE_MOE or mt in ("afmoe", "cohere2_moe", "lfm2_moe"):
        common.update(
            num_experts=(cfg.get("n_routed_experts")
                         or cfg.get("num_experts") or 0),
            num_experts_per_tok=(cfg.get("num_experts_per_tok")
                                 or cfg.get("moe_top_k") or 0),
            moe_intermediate_size=cfg.get("moe_intermediate_size", 0),
            norm_topk_prob=bool(cfg.get("norm_topk_prob", False)),
            n_shared_experts=(cfg.get("n_shared_experts")
                              or cfg.get("num_shared_experts") or 0),
            first_k_dense_replace=(cfg.get("first_k_dense_replace")
                                   or cfg.get("num_dense_layers") or 0),
            moe_topk_method=cfg.get("topk_method", "greedy"),
            moe_scoring=cfg.get(
                "scoring_func", cfg.get("score_function", "softmax")
            ),
            n_group=cfg.get("n_group") or 0,
            topk_group=cfg.get("topk_group") or 0,
            routed_scaling_factor=cfg.get("routed_scaling_factor", 1.0),
        )
        if cfg.get("use_qk_norm") or cfg.get("use_qk_layernorm"):
            common["qk_norm"] = True
    if mt in ("glm4_moe_lite", "glm_moe_dsa", "axk2") and cfg.get(
        "kv_lora_rank"
    ):
        qk_rope = cfg.get("qk_rope_head_dim", 64)
        qk_nope = cfg.get("qk_nope_head_dim", 128)
        common.update(
            mla=True,
            head_dim=qk_nope + qk_rope,
            num_kv_heads=heads,
            q_lora_rank=cfg.get("q_lora_rank") or 0,
            kv_lora_rank=cfg.get("kv_lora_rank") or 0,
            qk_rope_head_dim=qk_rope,
            qk_nope_head_dim=qk_nope,
            v_head_dim=cfg.get("v_head_dim", 128),
        )
    if mt == "minimax_m2":
        # per-head q/k RMSNorm + sigmoid-scored w1/w3/w2 MoE with a
        # score-correction bias (definitions/minimax_m2.py)
        common.update(
            qk_norm=True,
            num_experts=cfg.get("num_local_experts", 0),
            num_experts_per_tok=cfg.get("num_experts_per_tok", 2),
            moe_intermediate_size=cfg.get("intermediate_size", 0),
            moe_scoring=cfg.get("scoring_func", "sigmoid"),
            norm_topk_prob=bool(cfg.get("norm_topk_prob", True)),
        )
    if mt == "lfm2_moe":
        common.update(
            qk_norm=True,
            rms_norm_eps=cfg.get("norm_eps", 1e-5),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            mamba_d_conv=cfg.get("conv_L_cache", 3),
            layers_block_type=tuple(
                "attention" if t == "full_attention" else "conv"
                for t in (cfg.get("layer_types") or [])
            ),
            layer_types=(),
        )
    if mt not in _LLAMA_FAMILY:
        # Unregistered arch: fall back to llama-shaped interpretation (the
        # reference's auto module-tree detection analog; may still work for
        # llama-likes with exotic model_type strings).
        pass
    return ModelSpec(**common)


def load_hf_config(model_dir: str | Path) -> dict:
    return json.loads((Path(model_dir) / "config.json").read_text())
