"""DBRX checkpoint canonicalization.

Native DBRX stores each layer as ``transformer.blocks.N.norm_attn_norm.{
norm_1, attn.{Wqkv, out_proj}, norm_2}`` + ``ffn.{router.layer,
experts.mlp.{w1, v1, w2}}`` with the three expert projections FUSED into
single ``[E*F, D]`` parameters (modeling_dbrx.py:627-660). The reference
handles this by shipping a separate converted definition
(definitions/dbrx_converted.py); here a lazy reader wrapper re-exposes the
checkpoint in the canonical mixtral-shaped layout the rest of the stack
already understands:

    model.layers.N.input_layernorm / self_attn.{qkv_proj, o_proj} /
    post_attention_layernorm / block_sparse_moe.{gate, experts.E.{w1,w3,w2}}

``w2`` slices are transposed to the [out, in] Linear convention (the native
parameter multiplies UNtransposed, DbrxExpertGLU.forward). Canonical names
pass through untouched, so our own quantized exports (saved canonical)
reload without the wrapper doing any work.
"""

from __future__ import annotations

import re

import numpy as np

_BLOCK = re.compile(r"^model\.layers\.(\d+)\.(.*)$")
_EXPERT = re.compile(r"^block_sparse_moe\.experts\.(\d+)\.(w1|w3|w2)\.weight$")

_SIMPLE = {
    "input_layernorm.weight": "norm_attn_norm.norm_1.weight",
    "self_attn.qkv_proj.weight": "norm_attn_norm.attn.Wqkv.weight",
    "self_attn.o_proj.weight": "norm_attn_norm.attn.out_proj.weight",
    "post_attention_layernorm.weight": "norm_attn_norm.norm_2.weight",
    "block_sparse_moe.gate.weight": "ffn.router.layer.weight",
}
_ROOT = {
    "model.embed_tokens.weight": "transformer.wte.weight",
    "model.norm.weight": "transformer.norm_f.weight",
    "lm_head.weight": "lm_head.weight",
}
_FUSED = {"w1": "w1", "w3": "v1", "w2": "w2"}


class DbrxReader:
    """CheckpointReader wrapper exposing the canonical tensor namespace."""

    def __init__(self, reader, hf_cfg: dict):
        self._r = reader
        ffn = hf_cfg.get("ffn_config") or {}
        self.E = int(ffn.get("moe_num_experts", 0))
        self.F = int(ffn.get("ffn_hidden_size", 0))
        self.D = int(hf_cfg.get("d_model", 0))
        self._native = set(reader.names())

    def names(self):
        out = []
        for n in self._native:
            m = re.match(r"^transformer\.blocks\.(\d+)\.(.*)$", n)
            if m is None:
                for canon, native in _ROOT.items():
                    if n == native:
                        out.append(canon)
                        break
                else:
                    out.append(n)
                continue
            li, rest = m.group(1), m.group(2)
            inv = {v: k for k, v in _SIMPLE.items()}
            if rest in inv:
                out.append(f"model.layers.{li}.{inv[rest]}")
            elif re.match(r"^ffn\.experts\.mlp\.(w1|v1|w2)$", rest):
                kind = rest.rsplit(".", 1)[-1]
                canon_kind = {"w1": "w1", "v1": "w3", "w2": "w2"}[kind]
                for e in range(self.E):
                    out.append(
                        f"model.layers.{li}.block_sparse_moe.experts."
                        f"{e}.{canon_kind}.weight"
                    )
            else:
                out.append(n)
        return out

    def get(self, name: str) -> np.ndarray:
        if name in self._native:  # canonical-named (our own exports) or misc
            return self._r.get(name)
        if name in _ROOT and _ROOT[name] in self._native:
            return self._r.get(_ROOT[name])
        m = _BLOCK.match(name)
        if m is not None:
            li, rest = m.group(1), m.group(2)
            if rest in _SIMPLE:
                return self._r.get(f"transformer.blocks.{li}.{_SIMPLE[rest]}")
            me = _EXPERT.match(rest)
            if me is not None:
                e, kind = int(me.group(1)), me.group(2)
                native = _FUSED[kind]
                fused = self._r.get(
                    f"transformer.blocks.{li}.ffn.experts.mlp.{native}"
                )  # [E*F, D]
                sl = fused[e * self.F : (e + 1) * self.F]
                # w2 multiplies untransposed (x @ w2) -> [in=F, out=D];
                # transpose to the [out, in] Linear convention
                return np.ascontiguousarray(sl.T) if kind == "w2" else sl
        return self._r.get(name)

    def __contains__(self, name: str) -> bool:
        try:
            self.get(name)
            return True
        except Exception:
            return False


def wrap_dbrx_reader(reader, hf_cfg: dict):
    if any(n.startswith("transformer.blocks.") for n in reader.names()):
        return DbrxReader(reader, hf_cfg)
    return reader  # already canonical (our own quantized export)
