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


def wrap_internlm2_reader(reader, hf_cfg: dict):
    return RenameReader(reader, _INTERNLM2_RULES)


def wrap_baichuan_reader(reader, hf_cfg: dict):
    return RenameReader(reader, _BAICHUAN_RULES)
