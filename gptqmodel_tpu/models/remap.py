"""Name-remapping CheckpointReader wrappers for remote-code architectures.

These archs (internlm2, baichuan, minicpm) ship custom modeling code on the
hub instead of transformers-native classes; their checkpoints are llama
bodies under different tensor names (and, for internlm2, a grouped fused
qkv). A lazy rename wrapper canonicalizes them to the llama namespace so the
whole stack (tree, forward, looper, writer) runs unchanged — the analog of
the reference's per-arch definition classes for these models
(definitions/internlm2.py, baichuan.py, minicpm.py).

Canonical names pass through untouched, so our own quantized exports reload
without rules firing.
"""

from __future__ import annotations

import re


class RenameReader:
    """Wraps a CheckpointReader with regex rename rules (native -> canon)."""

    def __init__(self, reader, rules: list[tuple[str, str]]):
        self._r = reader
        self._to_canon = [(re.compile(p), repl) for p, repl in rules]
        self._canon2native: dict[str, str] = {}
        for n in reader.names():
            c = n
            for pat, repl in self._to_canon:
                c2 = pat.sub(repl, c)
                if c2 != c:
                    c = c2
                    break
            self._canon2native[c] = n

    def names(self):
        return list(self._canon2native)

    def get(self, name: str):
        return self._r.get(self._canon2native.get(name, name))

    def __contains__(self, name: str) -> bool:
        return name in self._canon2native or name in set(self._r.names())


_INTERNLM2_RULES = [
    (r"^model\.tok_embeddings\.", "model.embed_tokens."),
    (r"^output\.", "lm_head."),
    (r"(\.layers\.\d+)\.attention_norm\.", r"\1.input_layernorm."),
    (r"(\.layers\.\d+)\.ffn_norm\.", r"\1.post_attention_layernorm."),
    (r"(\.layers\.\d+)\.attention\.wqkv\.", r"\1.self_attn.qkv_proj."),
    (r"(\.layers\.\d+)\.attention\.wo\.", r"\1.self_attn.o_proj."),
    (r"(\.layers\.\d+)\.feed_forward\.w1\.", r"\1.mlp.gate_proj."),
    (r"(\.layers\.\d+)\.feed_forward\.w3\.", r"\1.mlp.up_proj."),
    (r"(\.layers\.\d+)\.feed_forward\.w2\.", r"\1.mlp.down_proj."),
]

_BAICHUAN_RULES = [
    (r"(\.layers\.\d+)\.self_attn\.W_pack\.", r"\1.self_attn.qkv_proj."),
]

# exaone (EXAONE-3.x, remote code; reference definitions/exaone.py tree):
# llama body under transformer.h with gpt_neo-style nesting and c_fc_0/
# c_fc_1/c_proj gate/up/down names
_EXAONE_RULES = [
    (r"^transformer\.wte\.", "model.embed_tokens."),
    (r"^transformer\.ln_f\.", "model.norm."),
    (r"^transformer\.h\.(\d+)\.ln_1\.", r"model.layers.\1.input_layernorm."),
    (r"^transformer\.h\.(\d+)\.ln_2\.",
     r"model.layers.\1.post_attention_layernorm."),
    (r"^transformer\.h\.(\d+)\.attn\.attention\.out_proj\.",
     r"model.layers.\1.self_attn.o_proj."),
    (r"^transformer\.h\.(\d+)\.attn\.attention\.(q_proj|k_proj|v_proj)\.",
     r"model.layers.\1.self_attn.\2."),
    (r"^transformer\.h\.(\d+)\.mlp\.c_fc_0\.", r"model.layers.\1.mlp.gate_proj."),
    (r"^transformer\.h\.(\d+)\.mlp\.c_fc_1\.", r"model.layers.\1.mlp.up_proj."),
    (r"^transformer\.h\.(\d+)\.mlp\.c_proj\.", r"model.layers.\1.mlp.down_proj."),
]


def wrap_exaone_reader(reader, hf_cfg: dict):
    if any(n.startswith("transformer.h.") for n in reader.names()):
        return RenameReader(reader, _EXAONE_RULES)
    return reader


_VL_RULES = [
    (r"^model\.language_model\.", "model."),  # new-style nesting
    (r"^language_model\.model\.", "model."),  # llava legacy save layout
    (r"^language_model\.lm_head\.", "lm_head."),
    (r"^llm\.model\.", "model."),  # ovis / minicpm-v tower nesting
    (r"^llm\.lm_head\.", "lm_head."),
    (r"^language\.model\.", "model."),  # deepseek_vl_v2 tower nesting
    (r"^language\.lm_head\.", "lm_head."),
    (r"^thinker\.model\.", "model."),  # qwen omni thinker nesting
    (r"^thinker\.lm_head\.", "lm_head."),
]

_VL_PREFIXES = (
    "model.language_model.",
    "language_model.",
    "llm.model.",
    "language.model.",
    "thinker.model.",
)


def wrap_vl_reader(reader, hf_cfg: dict):
    """VL text-tower canonicalization (llava / qwen2_vl / ovis / minicpm-v /
    deepseek_vl(_v2) / qwen omni thinker): {model.language_model |
    language_model.model | llm.model | language.model | thinker.model}.* ->
    model.*; the vision/audio towers (visual / vision_tower / vpm / apm /
    audio_tower) and projectors pass through untouched and re-export dense.
    qwen2_vl's legacy save layout is already canonical (model.layers.* +
    top-level visual.*)."""
    if any(n.startswith(_VL_PREFIXES) for n in reader.names()):
        return RenameReader(reader, _VL_RULES)
    return reader


_PHI4MM_RULES = [
    # phi4mm wraps every projection in a vision/speech LoRA adapter shell;
    # the frozen base weight lives under <proj>.base_layer (reference
    # definitions/phi4.py:17-41 quantizes exactly those base_layer leaves).
    # The lora_A/lora_B adapter stacks pass through untouched (dense).
    (r"\.(qkv_proj|o_proj|gate_up_proj|down_proj)\.base_layer\.", r".\1."),
]


def wrap_phi4mm_reader(reader, hf_cfg: dict):
    if any(".base_layer." in n for n in reader.names()):
        return RenameReader(reader, _PHI4MM_RULES)
    return reader


_BAILING_RULES = [
    # bailing_moe (Ling) / llada2_moe: fused attention block under
    # ``attention.*`` with a word_embeddings embed table (reference
    # definitions/bailing_moe.py, llada2.py trees)
    (r"^model\.word_embeddings\.", "model.embed_tokens."),
    (r"(\.layers\.\d+)\.attention\.query_key_value\.",
     r"\1.self_attn.qkv_proj."),
    (r"(\.layers\.\d+)\.attention\.dense\.", r"\1.self_attn.o_proj."),
    (r"(\.layers\.\d+)\.attention\.query_layernorm\.",
     r"\1.self_attn.q_norm."),
    (r"(\.layers\.\d+)\.attention\.key_layernorm\.", r"\1.self_attn.k_norm."),
]


def wrap_bailing_reader(reader, hf_cfg: dict):
    if any(".attention.query_key_value." in n for n in reader.names()):
        return RenameReader(reader, _BAILING_RULES)
    return reader


_CHATGLM_RULES = [
    # chatglm2/3 / glm-4 remote-code layout (reference definitions/chatglm.py
    # tree): glm-family body (fused qkv w/ bias, fused swiglu h_to_4h, half
    # interleaved rotary) under transformer.encoder.*
    (r"^transformer\.embedding\.word_embeddings\.", "model.embed_tokens."),
    (r"^transformer\.encoder\.final_layernorm\.", "model.norm."),
    (r"^transformer\.output_layer\.", "lm_head."),
    (r"^transformer\.encoder\.layers\.(\d+)\.input_layernorm\.",
     r"model.layers.\1.input_layernorm."),
    (r"^transformer\.encoder\.layers\.(\d+)\.post_attention_layernorm\.",
     r"model.layers.\1.post_attention_layernorm."),
    (r"^transformer\.encoder\.layers\.(\d+)\.self_attention\.query_key_value\.",
     r"model.layers.\1.self_attn.qkv_proj."),
    (r"^transformer\.encoder\.layers\.(\d+)\.self_attention\.dense\.",
     r"model.layers.\1.self_attn.o_proj."),
    (r"^transformer\.encoder\.layers\.(\d+)\.mlp\.dense_h_to_4h\.",
     r"model.layers.\1.mlp.gate_up_proj."),
    (r"^transformer\.encoder\.layers\.(\d+)\.mlp\.dense_4h_to_h\.",
     r"model.layers.\1.mlp.down_proj."),
]


def wrap_chatglm_reader(reader, hf_cfg: dict):
    if any(n.startswith("transformer.encoder.layers.") for n in reader.names()):
        return RenameReader(reader, _CHATGLM_RULES)
    return reader


_QWEN1_RULES = [
    # qwen (QWen-1 remote code, reference definitions/qwen.py tree): llama
    # body under transformer.h with fused biased c_attn and w1/w2 swiglu
    # where w2 is the SILU (gate) branch: c_proj(w1(x) * silu(w2(x)))
    (r"^transformer\.wte\.", "model.embed_tokens."),
    (r"^transformer\.ln_f\.", "model.norm."),
    (r"^transformer\.h\.(\d+)\.ln_1\.", r"model.layers.\1.input_layernorm."),
    (r"^transformer\.h\.(\d+)\.ln_2\.",
     r"model.layers.\1.post_attention_layernorm."),
    (r"^transformer\.h\.(\d+)\.attn\.c_attn\.",
     r"model.layers.\1.self_attn.qkv_proj."),
    (r"^transformer\.h\.(\d+)\.attn\.c_proj\.",
     r"model.layers.\1.self_attn.o_proj."),
    (r"^transformer\.h\.(\d+)\.mlp\.w2\.", r"model.layers.\1.mlp.gate_proj."),
    (r"^transformer\.h\.(\d+)\.mlp\.w1\.", r"model.layers.\1.mlp.up_proj."),
    (r"^transformer\.h\.(\d+)\.mlp\.c_proj\.",
     r"model.layers.\1.mlp.down_proj."),
]


def wrap_qwen1_reader(reader, hf_cfg: dict):
    if any(n.startswith("transformer.h.") for n in reader.names()):
        return RenameReader(reader, _QWEN1_RULES)
    return reader


_RW_RULES = [
    # RefinedWeb / RefinedWebModel (falcon-rw remote code; reference
    # definitions/rw.py tree): falcon body under transformer.h with ln_1/ln_2
    # norm names instead of the transformers falcon port's
    # input_layernorm/post_attention_layernorm
    (r"(\.h\.\d+)\.ln_1\.", r"\1.input_layernorm."),
    (r"(\.h\.\d+)\.ln_2\.", r"\1.post_attention_layernorm."),
]


def wrap_rw_reader(reader, hf_cfg: dict):
    if any(".ln_1." in n for n in reader.names()):
        return RenameReader(reader, _RW_RULES)
    return reader


_NEMOTRON_OMNI_RULES = [
    # nemotronh_nano_omni_reasoning_v3 (reference definitions/
    # nemotron_omni.py): a nemotron_h backbone nested under language_model;
    # the vision/sound towers + projectors pass through and re-export dense
    (r"^language_model\.backbone\.", "backbone."),
    (r"^language_model\.lm_head\.", "lm_head."),
]


def wrap_nemotron_omni_reader(reader, hf_cfg: dict):
    if any(n.startswith("language_model.backbone.") for n in reader.names()):
        return RenameReader(reader, _NEMOTRON_OMNI_RULES)
    return reader


def wrap_hrm_reader(reader, hf_cfg: dict):
    """hrm_text (reference definitions/hrm_text.py): TWO stacked decoder
    containers (model.L_module.layers / model.H_module.layers) with identical
    block structure. Flattened into one model.layers stack (L first, then H
    offset by L's depth) so the single-container looper/forward machinery
    applies; the attention-side gate_proj rides along as a plain leaf."""
    names = list(reader.names())
    if not any(".L_module.layers." in n or ".H_module.layers." in n
               for n in names):
        return reader
    n_l = 0
    for n in names:
        m = re.match(r"^model\.L_module\.layers\.(\d+)\.", n)
        if m:
            n_l = max(n_l, int(m.group(1)) + 1)
    rules = [
        (r"^model\.L_module\.layers\.(\d+)\.", r"model.layers.\1."),
        (r"^model\.L_module\.", "model."),
    ]
    for n in names:
        m = re.match(r"^model\.H_module\.layers\.(\d+)\.", n)
        if m:
            i = int(m.group(1))
            rules.append((
                rf"^model\.H_module\.layers\.{i}\.",
                rf"model.layers.{n_l + i}.",
            ))
    rules.append((r"^model\.H_module\.", "model."))
    return RenameReader(reader, rules)


class TeleChatReader:
    """telechat/telechat2 canonicalization (reference definitions/
    telechat2.py tree: transformer.h.#.self_attention.{query,key_value,
    dense} + gate/up/down MLP). Native key_value fuses K and V per head:
    [nkv, 2*hd] with k in the first hd columns of each head block. Split
    into canonical k_proj/v_proj; query -> q_proj, dense -> o_proj;
    word_embeddings/ln_f -> embed_tokens/norm."""

    _RULES = [
        (r"^transformer\.word_embeddings\.", "model.embed_tokens."),
        (r"^transformer\.ln_f\.", "model.norm."),
        (r"^transformer\.h\.(\d+)\.input_layernorm\.",
         r"model.layers.\1.input_layernorm."),
        (r"^transformer\.h\.(\d+)\.post_attention_layernorm\.",
         r"model.layers.\1.post_attention_layernorm."),
        (r"^transformer\.h\.(\d+)\.self_attention\.query\.",
         r"model.layers.\1.self_attn.q_proj."),
        (r"^transformer\.h\.(\d+)\.self_attention\.dense\.",
         r"model.layers.\1.self_attn.o_proj."),
        (r"^transformer\.h\.(\d+)\.mlp\.gate_proj\.",
         r"model.layers.\1.mlp.gate_proj."),
        (r"^transformer\.h\.(\d+)\.mlp\.up_proj\.",
         r"model.layers.\1.mlp.up_proj."),
        (r"^transformer\.h\.(\d+)\.mlp\.down_proj\.",
         r"model.layers.\1.mlp.down_proj."),
    ]

    def __init__(self, reader, hf_cfg: dict):
        self._r = RenameReader(reader, self._RULES)
        heads = hf_cfg.get("n_head") or hf_cfg.get("num_attention_heads")
        hidden = hf_cfg["hidden_size"]
        self.hd = hidden // heads
        self._kv = {}  # canonical k/v name -> (native kv name, 0|1)
        for n in reader.names():
            m = re.match(
                r"^transformer\.h\.(\d+)\.self_attention\.key_value"
                r"\.(weight|bias)$", n)
            if m:
                for j, leaf in enumerate(("k_proj", "v_proj")):
                    self._kv[f"model.layers.{m.group(1)}.self_attn."
                             f"{leaf}.{m.group(2)}"] = (n, j)

    def names(self):
        return [n for n in self._r.names()
                if ".self_attention.key_value." not in n] + list(self._kv)

    def get(self, name: str):
        if name in self._kv:
            import numpy as np

            native, j = self._kv[name]
            W = self._r.get(native)  # weight [2*nkv*hd, hidden] | bias [...]
            halves = W.reshape(-1, 2, self.hd, *W.shape[1:])
            return np.ascontiguousarray(
                halves[:, j].reshape(-1, *W.shape[1:]))
        return self._r.get(name)

    def __contains__(self, name: str) -> bool:
        return name in self._kv or name in self._r


def wrap_telechat_reader(reader, hf_cfg: dict):
    if any(".self_attention.key_value." in n for n in reader.names()):
        return TeleChatReader(reader, hf_cfg)
    return reader


def wrap_internlm2_reader(reader, hf_cfg: dict):
    return RenameReader(reader, _INTERNLM2_RULES)


def wrap_baichuan_reader(reader, hf_cfg: dict):
    return RenameReader(reader, _BAICHUAN_RULES)


class CodeGenReader:
    """codegen fused-qkv canonicalization (modeling_codegen.py:92-177).

    Native: attn.qkv_proj [3h, h] whose OUT rows form mp_num=4 blocks of
    [q(h/4) | v(h/4) | k(h/4)] (note the q,v,k order). Canonical: separate
    q_proj/k_proj/v_proj [h, h] in plain head order (block-major, matching
    _split_heads' reshape)."""

    MP_NUM = 4

    def __init__(self, reader, hf_cfg: dict):
        self._r = reader
        self._native = set(reader.names())

    def names(self):
        out = []
        for n in self._native:
            m = re.match(r"^(transformer\.h\.\d+\.attn)\.qkv_proj\.weight$", n)
            if m is None:
                out.append(n)
                continue
            for leaf in ("q_proj", "k_proj", "v_proj"):
                out.append(f"{m.group(1)}.{leaf}.weight")
        return out

    def get(self, name: str):
        if name in self._native:
            return self._r.get(name)
        m = re.match(
            r"^(transformer\.h\.\d+\.attn)\.(q_proj|k_proj|v_proj)\.weight$",
            name,
        )
        if m is None:
            return self._r.get(name)
        import numpy as np

        W = self._r.get(f"{m.group(1)}.qkv_proj.weight")  # [3h, h]
        h = W.shape[1]
        blocks = W.reshape(self.MP_NUM, 3 * h // self.MP_NUM, h)
        loc = h // self.MP_NUM
        sel = {"q_proj": 0, "v_proj": 1, "k_proj": 2}[m.group(2)]
        return np.ascontiguousarray(
            blocks[:, sel * loc : (sel + 1) * loc].reshape(h, h)
        )

    def __contains__(self, name: str) -> bool:
        try:
            self.get(name)
            return True
        except Exception:
            return False


def wrap_codegen_reader(reader, hf_cfg: dict):
    if any(".attn.qkv_proj." in n for n in reader.names()):
        return CodeGenReader(reader, hf_cfg)
    return reader


class GptOssReader:
    """gpt_oss fused expert canonicalization (modeling_gpt_oss.py:67-141).

    Native: mlp.experts.{gate_up_proj [E, D, 2F] (gate/up INTERLEAVED on the
    last dim) + bias [E, 2F], down_proj [E, F, D] + bias [E, D]},
    mlp.router.{weight,bias}. Canonical: per-expert gate_proj/up_proj/
    down_proj Linears ([out, in] convention) with biases + mlp.gate router.
    """

    def __init__(self, reader, hf_cfg: dict):
        self._r = reader
        self.E = int(hf_cfg.get("num_local_experts", 0))
        self._native = set(reader.names())

    def names(self):
        out = []
        for n in self._native:
            m = re.match(r"^(model\.layers\.\d+\.mlp)\.(.*)$", n)
            if m is None:
                out.append(n)
                continue
            base, rest = m.group(1), m.group(2)
            if rest == "router.weight":
                out.append(f"{base}.gate.weight")
            elif rest == "router.bias":
                out.append(f"{base}.gate.bias")
            elif rest in ("experts.gate_up_proj", "experts.gate_up_proj_bias"):
                leaf = "weight" if rest.endswith("proj") else "bias"
                for e in range(self.E):
                    out.append(f"{base}.experts.{e}.gate_proj.{leaf}")
                    out.append(f"{base}.experts.{e}.up_proj.{leaf}")
            elif rest in ("experts.down_proj", "experts.down_proj_bias"):
                leaf = "weight" if rest.endswith("proj") else "bias"
                for e in range(self.E):
                    out.append(f"{base}.experts.{e}.down_proj.{leaf}")
            else:
                out.append(n)
        return out

    def get(self, name: str):
        if name in self._native:
            return self._r.get(name)
        m = re.match(
            r"^(model\.layers\.\d+\.mlp)\.(?:gate\.(weight|bias)|"
            r"experts\.(\d+)\.(gate_proj|up_proj|down_proj)\.(weight|bias))$",
            name,
        )
        if m is None:
            return self._r.get(name)
        base = m.group(1)
        if m.group(2):  # router
            return self._r.get(f"{base}.router.{m.group(2)}")
        e, kind, leaf = int(m.group(3)), m.group(4), m.group(5)
        import numpy as np

        if kind == "down_proj":
            t = self._r.get(
                f"{base}.experts.down_proj"
                + ("" if leaf == "weight" else "_bias")
            )
            if leaf == "weight":  # [E, F, D] multiplies untransposed
                return np.ascontiguousarray(t[e].T)
            return t[e]
        t = self._r.get(
            f"{base}.experts.gate_up_proj"
            + ("" if leaf == "weight" else "_bias")
        )
        if leaf == "weight":  # [E, D, 2F]: interleaved gate/up columns
            sl = t[e][:, 0::2] if kind == "gate_proj" else t[e][:, 1::2]
            return np.ascontiguousarray(sl.T)  # -> [F, D]
        return t[e][0::2] if kind == "gate_proj" else t[e][1::2]

    def __contains__(self, name: str) -> bool:
        try:
            self.get(name)
            return True
        except Exception:
            return False


def wrap_gpt_oss_reader(reader, hf_cfg: dict):
    if any(".mlp.experts.gate_up_proj" in n for n in reader.names()):
        return GptOssReader(reader, hf_cfg)
    return reader  # already canonical (our quantized exports)


class Llama4Reader:
    """llama4 fused expert canonicalization (modeling_llama4.py:46-76).

    Native: feed_forward.experts.{gate_up_proj [E, D, 2F] (gate|up as chunk
    HALVES), down_proj [E, F, D]}, feed_forward.router. Canonical:
    per-expert gate_proj/up_proj/down_proj Linears + feed_forward.gate."""

    def __init__(self, reader, hf_cfg: dict):
        self._r = reader
        txt = hf_cfg.get("text_config") or hf_cfg
        self.E = int(txt.get("num_local_experts", 0))
        self._native = set(reader.names())

    def names(self):
        out = []
        for n in self._native:
            m = re.match(r"^(model\.layers\.\d+\.feed_forward)\.(.*)$", n)
            if m is None:
                out.append(n)
                continue
            base, rest = m.group(1), m.group(2)
            if rest == "router.weight":
                out.append(f"{base}.gate.weight")
            elif rest == "experts.gate_up_proj":
                for e in range(self.E):
                    out.append(f"{base}.experts.{e}.gate_proj.weight")
                    out.append(f"{base}.experts.{e}.up_proj.weight")
            elif rest == "experts.down_proj":
                for e in range(self.E):
                    out.append(f"{base}.experts.{e}.down_proj.weight")
            else:
                out.append(n)
        return out

    def get(self, name: str):
        if name in self._native:
            return self._r.get(name)
        m = re.match(
            r"^(model\.layers\.\d+\.feed_forward)\.(?:gate\.(weight)|"
            r"experts\.(\d+)\.(gate_proj|up_proj|down_proj)\.weight)$",
            name,
        )
        if m is None:
            return self._r.get(name)
        base = m.group(1)
        if m.group(2):
            return self._r.get(f"{base}.router.weight")
        import numpy as np

        e, kind = int(m.group(3)), m.group(4)
        if kind == "down_proj":
            t = self._r.get(f"{base}.experts.down_proj")  # [E, F, D] untransposed
            return np.ascontiguousarray(t[e].T)
        t = self._r.get(f"{base}.experts.gate_up_proj")  # [E, D, 2F] halves
        F = t.shape[-1] // 2
        sl = t[e][:, :F] if kind == "gate_proj" else t[e][:, F:]
        return np.ascontiguousarray(sl.T)

    def __contains__(self, name: str) -> bool:
        try:
            self.get(name)
            return True
        except Exception:
            return False


def wrap_llama4_reader(reader, hf_cfg: dict):
    if any(".feed_forward.experts.gate_up_proj" in n for n in reader.names()):
        return Llama4Reader(reader, hf_cfg)
    return reader


class GraniteMoeReader:
    """granitemoe(+hybrid) fused expert canonicalization
    (modeling_granitemoe.py:226-386): block_sparse_moe.input_linear
    [E, 2F, D] (gate|up chunk halves) / output_linear [E, D, F] -> per-expert
    Linears; router.layer -> gate; the hybrid's fused shared_mlp
    input/output_linear -> gate_up_proj/down_proj."""

    def __init__(self, reader, hf_cfg: dict):
        self._r = reader
        self.E = int(hf_cfg.get("num_local_experts", 0))
        self._native = set(reader.names())

    def names(self):
        out = []
        for n in self._native:
            m = re.match(r"^(model\.layers\.\d+)\.(.*)$", n)
            if m is None:
                out.append(n)
                continue
            base, rest = m.group(1), m.group(2)
            if rest == "block_sparse_moe.router.layer.weight":
                out.append(f"{base}.block_sparse_moe.gate.weight")
            elif rest == "block_sparse_moe.input_linear.weight":
                for e in range(self.E):
                    out.append(f"{base}.block_sparse_moe.experts.{e}.gate_proj.weight")
                    out.append(f"{base}.block_sparse_moe.experts.{e}.up_proj.weight")
            elif rest == "block_sparse_moe.output_linear.weight":
                for e in range(self.E):
                    out.append(f"{base}.block_sparse_moe.experts.{e}.down_proj.weight")
            elif rest == "shared_mlp.input_linear.weight":
                out.append(f"{base}.shared_mlp.gate_up_proj.weight")
            elif rest == "shared_mlp.output_linear.weight":
                out.append(f"{base}.shared_mlp.down_proj.weight")
            else:
                out.append(n)
        return out

    def get(self, name: str):
        if name in self._native:
            return self._r.get(name)
        import numpy as np

        m = re.match(
            r"^(model\.layers\.\d+)\.block_sparse_moe\.(?:gate\.weight|"
            r"experts\.(\d+)\.(gate_proj|up_proj|down_proj)\.weight)$", name
        )
        if m is not None:
            base = m.group(1)
            if m.group(2) is None:
                return self._r.get(f"{base}.block_sparse_moe.router.layer.weight")
            e, kind = int(m.group(2)), m.group(3)
            if kind == "down_proj":
                return self._r.get(
                    f"{base}.block_sparse_moe.output_linear.weight"
                )[e]  # [D, F] already [out, in]
            t = self._r.get(f"{base}.block_sparse_moe.input_linear.weight")[e]
            F = t.shape[0] // 2
            return t[:F] if kind == "gate_proj" else t[F:]
        m = re.match(
            r"^(model\.layers\.\d+)\.shared_mlp\.(gate_up_proj|down_proj)\.weight$",
            name,
        )
        if m is not None:
            base, kind = m.group(1), m.group(2)
            native = "input_linear" if kind == "gate_up_proj" else "output_linear"
            return self._r.get(f"{base}.shared_mlp.{native}.weight")
        return self._r.get(name)

    def __contains__(self, name: str) -> bool:
        try:
            self.get(name)
            return True
        except Exception:
            return False


def wrap_granitemoe_reader(reader, hf_cfg: dict):
    if any(".block_sparse_moe.input_linear." in n or
           ".shared_mlp.input_linear." in n for n in reader.names()):
        return GraniteMoeReader(reader, hf_cfg)
    return reader
