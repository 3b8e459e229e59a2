"""GGUF <-> params-tree conversion (llama architecture).

Import (reference parity: internal GGUF loader + gguf qlinear kernels,
gptqmodel/utils/internal_gguf.py, nn_modules/qlinear/gguf.py):

- Q4_0 / Q8_0 linear weights convert **bit-exact** into ``QuantLinear``
  (Q4_0 = 4-bit g32 sym zero-8; Q8_0 = 8-bit g32 zero-128 with signed
  codes re-biased), so GGUF checkpoints serve through the same fused
  Pallas kernels as GPTQ ones.
- K-quants (Q4_K/Q6_K) and float tensors import dense (their non-integer
  sub-block minimums don't fit the integer-zero GPTQ form).
- attn_q/attn_k rows are un-permuted from llama.cpp's rope layout back to
  the HF rotate-half convention (inverse of convert_hf_to_gguf permute).

Export: dense/dequantized params -> Q4_0 / Q8_0 / F16 GGUF with llama
metadata derived from the ModelSpec (+ passthrough of imported KVs).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from gptqmodel_tpu.models.spec import ModelSpec
from gptqmodel_tpu.ops.qlinear import QuantLinear, make_quant_linear
from gptqmodel_tpu.utils import gguf as G

# llama-arch tensor name map (gguf -> HF); {i} = layer index
_NAME_MAP = {
    "token_embd.weight": "model.embed_tokens.weight",
    "output_norm.weight": "model.norm.weight",
    "output.weight": "lm_head.weight",
    "blk.{i}.attn_norm.weight": "model.layers.{i}.input_layernorm.weight",
    "blk.{i}.attn_q.weight": "model.layers.{i}.self_attn.q_proj.weight",
    "blk.{i}.attn_k.weight": "model.layers.{i}.self_attn.k_proj.weight",
    "blk.{i}.attn_v.weight": "model.layers.{i}.self_attn.v_proj.weight",
    "blk.{i}.attn_output.weight": "model.layers.{i}.self_attn.o_proj.weight",
    "blk.{i}.ffn_norm.weight": "model.layers.{i}.post_attention_layernorm.weight",
    "blk.{i}.ffn_gate.weight": "model.layers.{i}.mlp.gate_proj.weight",
    "blk.{i}.ffn_up.weight": "model.layers.{i}.mlp.up_proj.weight",
    "blk.{i}.ffn_down.weight": "model.layers.{i}.mlp.down_proj.weight",
}


def _map_name(gguf_name: str) -> str | None:
    if gguf_name in _NAME_MAP:
        return _NAME_MAP[gguf_name]
    if gguf_name.startswith("blk."):
        parts = gguf_name.split(".")
        tmpl = ".".join(["blk", "{i}"] + parts[2:])
        if tmpl in _NAME_MAP:
            return _NAME_MAP[tmpl].replace("{i}", parts[1])
    return None


def _unmap_name(hf_name: str) -> str | None:
    for g, h in _NAME_MAP.items():
        if "{i}" in g:
            head, tail = h.split("{i}")
            if hf_name.startswith(head) and hf_name.endswith(tail.lstrip(".")):
                mid = hf_name[len(head):]
                i = mid.split(".")[0]
                return g.replace("{i}", i)
        elif h == hf_name:
            return g
    return None


def _unpermute_rows(w: np.ndarray, n_head: int) -> np.ndarray:
    """Inverse of llama.cpp convert permute: gguf rope layout -> HF
    rotate-half. Acts on OUT rows only (2D [out, ...])."""
    out = w.shape[0]
    hd = out // n_head
    return (
        w.reshape(n_head, hd // 2, 2, *w.shape[1:])
        .swapaxes(1, 2)
        .reshape(w.shape)
    )


def _permute_rows(w: np.ndarray, n_head: int) -> np.ndarray:
    out = w.shape[0]
    hd = out // n_head
    return (
        w.reshape(n_head, 2, hd // 2, *w.shape[1:])
        .swapaxes(1, 2)
        .reshape(w.shape)
    )


def spec_from_gguf(meta: dict, arch: str = "llama") -> ModelSpec:
    g = lambda k, d=None: meta.get(f"{arch}.{k}", d)
    vocab = meta.get(f"{arch}.vocab_size")
    if vocab is None and "tokenizer.ggml.tokens" in meta:
        vocab = len(meta["tokenizer.ggml.tokens"])
    heads = g("attention.head_count")
    hidden = g("embedding_length")
    return ModelSpec(
        model_type=arch,
        vocab_size=int(vocab),
        hidden_size=int(hidden),
        intermediate_size=int(g("feed_forward_length")),
        num_layers=int(g("block_count")),
        num_heads=int(heads),
        num_kv_heads=int(g("attention.head_count_kv", heads)),
        head_dim=int(g("attention.key_length", hidden // heads)),
        rms_norm_eps=float(g("attention.layer_norm_rms_epsilon", 1e-5)),
        rope_theta=float(g("rope.freq_base", 10000.0)),
        max_position_embeddings=int(g("context_length", 4096)),
        tie_word_embeddings=False,
    )


def _q4_0_to_quant_linear(raw: np.ndarray, shape, row_perm_heads=None) -> QuantLinear:
    """Bit-exact Q4_0 -> QuantLinear: codes as stored, zeros=8, d as scales."""
    out_f, in_f = shape
    blocks = raw.reshape(out_f, in_f // 32, 18)
    d = blocks[:, :, :2].copy().view(np.float16)[:, :, 0]  # [out, G]
    qs = blocks[:, :, 2:]
    codes = np.empty((out_f, in_f // 32, 32), np.int32)
    codes[:, :, :16] = qs & 0xF
    codes[:, :, 16:] = qs >> 4
    codes = codes.reshape(out_f, in_f)
    if row_perm_heads:
        codes = _unpermute_rows(codes, row_perm_heads)
        d = _unpermute_rows(d, row_perm_heads)
    G_ = in_f // 32
    zeros = np.full((G_, out_f), 8, np.int64)
    return make_quant_linear(
        Q=codes, scales=d.T.astype(np.float16), zeros=zeros, g_idx=None,
        bias=None, bits=4, group_size=32, sym=True,
    )


def _q8_0_to_quant_linear(raw: np.ndarray, shape, row_perm_heads=None) -> QuantLinear:
    """Q8_0 -> 8-bit QuantLinear: signed codes re-biased by 128 (exact)."""
    out_f, in_f = shape
    blocks = raw.reshape(out_f, in_f // 32, 34)
    d = blocks[:, :, :2].copy().view(np.float16)[:, :, 0]
    q = blocks[:, :, 2:].view(np.int8).astype(np.int32) + 128
    codes = q.reshape(out_f, in_f)
    if row_perm_heads:
        codes = _unpermute_rows(codes, row_perm_heads)
        d = _unpermute_rows(d, row_perm_heads)
    G_ = in_f // 32
    zeros = np.full((G_, out_f), 128, np.int64)
    return make_quant_linear(
        Q=codes, scales=d.T.astype(np.float16), zeros=zeros, g_idx=None,
        bias=None, bits=8, group_size=32, sym=True,
    )


def load_gguf(path: str | Path):
    """GGUF file -> (spec, params tree, metadata). Q4_0/Q8_0 linears arrive
    as packed QuantLinear; everything else dense float32."""
    f = G.GGUFFile(path)
    arch = f.metadata.get("general.architecture", "llama")
    spec = spec_from_gguf(f.metadata, arch)
    from gptqmodel_tpu.models.transformer import set_by_path

    params: dict = {"model": {"layers": [dict() for _ in range(spec.num_layers)]}}

    def ensure(path_parts):
        node = params
        for p in path_parts:
            if isinstance(node, list):
                node = node[int(p)]
            else:
                node = node.setdefault(p, {})
        return node

    for name in f.names():
        hf = _map_name(name)
        if hf is None:
            continue
        shape, ttype, _ = f.tensors[name]
        perm_heads = None
        if name.endswith("attn_q.weight"):
            perm_heads = spec.num_heads
        elif name.endswith("attn_k.weight"):
            perm_heads = spec.num_kv_heads
        parts = hf.split(".")
        mod_parts, leaf = parts[:-1], parts[-1]
        is_linear_2d = len(shape) == 2 and leaf == "weight" and (
            "proj" in hf or hf == "lm_head.weight"
        )
        if ttype == G.GGML_Q4_0 and is_linear_2d:
            q = _q4_0_to_quant_linear(f.raw(name), shape, perm_heads)
            node = ensure(mod_parts[:-1])
            node[mod_parts[-1]] = q
            continue
        if ttype == G.GGML_Q8_0 and is_linear_2d:
            q = _q8_0_to_quant_linear(f.raw(name), shape, perm_heads)
            node = ensure(mod_parts[:-1])
            node[mod_parts[-1]] = q
            continue
        w = f.get(name, np.float32)
        if perm_heads:
            w = _unpermute_rows(w, perm_heads)
        node = ensure(mod_parts)
        node[leaf] = w
    return spec, params, f.metadata


_GG_QUANT = {  # name -> (ggml type, encoder, block elems)
    "q4_0": (G.GGML_Q4_0, G.quant_q4_0, 32),
    "q8_0": (G.GGML_Q8_0, G.quant_q8_0, 32),
    "q4_k": (G.GGML_Q4_K, G.quant_q4_k, 256),
    "q5_k": (G.GGML_Q5_K, G.quant_q5_k, 256),
    "q6_k": (G.GGML_Q6_K, G.quant_q6_k, 256),
    "q1_0": (G.GGML_Q1_0, G.quant_q1_0, 32),
    "f16": (G.GGML_F16, None, 1),
}


def export_gguf(
    path: str | Path,
    spec: ModelSpec,
    params: dict,
    quant_type: str = "q4_0",
    extra_metadata: dict | None = None,
):
    """Params tree -> GGUF (llama arch). Packed QuantLinears are dequantized
    first; 2D linear weights quantize to ``quant_type``, everything else F32.
    """
    from gptqmodel_tpu.models.writer import flatten_params
    from gptqmodel_tpu.ops.qlinear import dequantize_weight

    ttype_q, quant_fn, blk_elems = _GG_QUANT[quant_type]

    # flatten with QuantLinear -> dense
    flat: dict[str, np.ndarray] = {}

    def walk(tree, prefix=""):
        if isinstance(tree, QuantLinear):
            flat[f"{prefix}.weight"] = np.asarray(
                dequantize_weight(tree), np.float32
            ).T
            return
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}.{k}" if prefix else k)
        elif isinstance(tree, list):
            for i, v in enumerate(tree):
                walk(v, f"{prefix}.{i}")
        else:
            flat[prefix] = np.asarray(tree, np.float32)

    walk(params)

    meta = {
        "general.architecture": "llama",
        "general.name": "gptqmodel_tpu export",
        "llama.vocab_size": spec.vocab_size,
        "llama.embedding_length": spec.hidden_size,
        "llama.block_count": spec.num_layers,
        "llama.feed_forward_length": spec.intermediate_size,
        "llama.attention.head_count": spec.num_heads,
        "llama.attention.head_count_kv": spec.num_kv_heads,
        "llama.attention.key_length": spec.head_dim,
        "llama.attention.layer_norm_rms_epsilon": spec.rms_norm_eps,
        "llama.rope.freq_base": spec.rope_theta,
        "llama.context_length": spec.max_position_embeddings,
    }
    if extra_metadata:
        for k, v in extra_metadata.items():
            if isinstance(v, (int, float, str, bool, list)):
                meta.setdefault(k, v)

    tensors: dict[str, tuple] = {}
    for hf_name, w in flat.items():
        gname = _unmap_name(hf_name)
        if gname is None:
            continue
        if gname.endswith("attn_q.weight"):
            w = _permute_rows(w, spec.num_heads)
        elif gname.endswith("attn_k.weight"):
            w = _permute_rows(w, spec.num_kv_heads)
        quantize = (
            w.ndim == 2 and quant_fn is not None
            and ("proj" in hf_name or hf_name == "lm_head.weight")
            and w.shape[1] % blk_elems == 0
        )
        if quantize:
            tensors[gname] = (quant_fn(w).tobytes(), w.shape, ttype_q)
        elif w.ndim == 2 and quant_type == "f16":
            tensors[gname] = (
                w.astype(np.float16).tobytes(), w.shape, G.GGML_F16
            )
        else:
            tensors[gname] = (
                w.astype(np.float32).tobytes(), w.shape, G.GGML_F32
            )
    G.write_gguf(path, tensors, meta)
