"""Auto module-tree detection from checkpoint tensor names.

TPU-native analog of the reference's definition auto-selection + dynamic
module discovery (reference: gptqmodel/models/auto.py:MODEL_MAP lookup and
gptqmodel/models/base.py:443-470 tree parse — the reference ships ~130
hand-written definition classes and raises on unknown archs; here an unknown
``model_type`` gets its tree *inferred* from the safetensors tensor names,
so llama-lineage checkpoints with novel naming still quantize correctly).

Detection is purely structural — it needs only the tensor-name list (no
shapes, no weights):

1. The repeated-layer container is the leftmost ``<prefix>.<int>.<rest>``
   pattern with the most distinct integer indices.
2. Module paths are tensor names minus the param leaf (``.weight``/``.bias``),
   unioned over all layer indices (deepseek-style mixed dense/MoE stacks
   contribute both shapes; absent modules skip per-layer, looper semantics).
3. ``experts.<int>.<leaf>`` collapses to an ``experts.#`` template; the
   expert count is the max index + 1.
4. Norm-named modules (``*norm*``, ``ln_*``) and MoE routers (``gate``/
   ``router`` with an ``experts`` sibling) become capture-only (``:!``).
5. Output-side projections (o/down/fc2/…) get subset 1, everything else
   subset 0 — the reference's true_sequential stage split.
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import Iterable

_PARAM_LEAVES = {"weight", "bias"}
_LAYER_PAT = re.compile(r"^(.*?)\.(\d+)\.(.+)$")
_EXPERT_PAT = re.compile(r"^(.*?experts)\.(\d+)\.(.+)$")
_NORM_PAT = re.compile(r"(?:^|_)(?:ln\b|ln_|norm\b|norm_|layernorm|layer_norm)", re.I)
# output-side projection names across families (llama/opt/gpt2/bloom/mixtral)
_OUTPUT_LEAVES = {
    "o_proj", "out_proj", "down_proj", "w2", "fc2",
    "dense_4h_to_h", "c_proj", "dense", "wo",
}
_ROUTER_NAMES = {"gate", "router", "shared_expert_gate"}


def _is_norm(name: str) -> bool:
    return bool(_NORM_PAT.search(name))


def detect_module_tree(
    names: Iterable[str],
) -> tuple[tuple, int | None] | None:
    """Infer a module-tree DSL tuple from checkpoint tensor names.

    Returns ``(tree, num_experts)`` or ``None`` if no repeated-layer
    container is found (not a decoder-stack checkpoint).
    """
    by_prefix: dict[str, set[int]] = defaultdict(set)
    rels: dict[str, set[str]] = defaultdict(set)
    for n in names:
        m = _LAYER_PAT.match(n)
        if not m:
            continue
        prefix, idx, rest = m.group(1), int(m.group(2)), m.group(3)
        by_prefix[prefix].add(idx)
        rels[prefix].add(rest)
    if not by_prefix:
        return None
    # most distinct indices wins; ties -> shortest prefix (outermost container)
    layers_path = min(by_prefix, key=lambda p: (-len(by_prefix[p]), len(p)))

    # module paths = tensor rels minus the param leaf; collapse experts
    modules: set[str] = set()
    num_experts: int | None = None
    for rest in rels[layers_path]:
        parts = rest.split(".")
        if parts[-1] not in _PARAM_LEAVES:
            continue  # rotary inv_freq, quant sidecars, ...
        mod = ".".join(parts[:-1])
        if not mod:
            continue
        em = _EXPERT_PAT.match(mod)
        if em:
            e_idx = int(em.group(2))
            num_experts = max(num_experts or 0, e_idx + 1)
            mod = f"{em.group(1)}.#.{em.group(3)}"
        modules.add(mod)
    if not modules:
        return None

    # parents that own an experts template -> their "gate"/"router" children
    # are routers (capture-only), not quantizable linears
    moe_parents = {
        m.split(".experts.")[0] for m in modules if ".experts.#." in m or
        m.endswith(".experts.#")
    }

    def leaf_str(mod_path: str) -> str:
        name = mod_path.rsplit(".", 1)[-1]
        parent = mod_path.rsplit(".", 1)[0] if "." in mod_path else ""
        if _is_norm(name):
            return f"{name}:!"
        if name in _ROUTER_NAMES and parent in moe_parents:
            return f"{name}:!"
        return f"{name}:{1 if name in _OUTPUT_LEAVES else 0}"

    # nested dict: module path -> subtree; leaves attach at their parent
    root: dict = {}
    for mod in sorted(modules):
        segs = mod.split(".")
        node = root
        for s in segs[:-1]:
            node = node.setdefault(s, {})
        node.setdefault("__leaves__", []).append(
            (segs[-1], leaf_str(mod))
        )

    def emit(node: dict) -> dict:
        out: dict = {}
        leaves = dict(node.pop("__leaves__", []))
        for name in sorted(set(node) | set(leaves)):
            if name in node and name in leaves:
                # module is both a leaf (own params) and a parent — keep the
                # subtree and add the parent-leaf "" entry
                sub = emit(node[name])
                sub[""] = (leaves[name],)
                out[name] = sub
            elif name in node:
                sub = node[name]
                if set(sub) == {"__leaves__"}:
                    out[name] = tuple(ls for _, ls in sub["__leaves__"])
                else:
                    out[name] = emit(sub)
            else:
                out[name] = (leaves[name],)
        return out

    # layer-level: leaves become their own single-entry keys (leaf == key ->
    # the module itself, parse_module_tree semantics)
    top: dict = {}
    top_leaves = dict(root.pop("__leaves__", []))
    for name in sorted(set(root) | set(top_leaves)):
        if name in root:
            sub = root[name]
            if set(sub) == {"__leaves__"}:
                top[name] = tuple(ls for _, ls in sub["__leaves__"])
            else:
                top[name] = emit(sub)
            if name in top_leaves:
                if isinstance(top[name], tuple):
                    top[name] = top[name] + (top_leaves[name],)
                else:
                    top[name][""] = (top_leaves[name],)
        else:
            top[name] = (top_leaves[name],)

    tree = tuple(layers_path.split(".")) + ("#", top)
    return tree, num_experts


_LM_HEAD_NAMES = {"lm_head", "output", "embed_out", "score"}


def detect_model_def(names: Iterable[str]):
    """Full auto-detection: module tree + lm_head + pre-lm_head norm.

    Returns a ``ModelDef`` or ``None`` if no decoder stack is recognizable.
    """
    from gptqmodel_tpu.models.definitions import ModelDef

    names = list(names)
    detected = detect_module_tree(names)
    if detected is None:
        return None
    tree, num_experts = detected
    layers_path = ".".join(tree[: tree.index("#")])

    lm_head = "lm_head"
    pre_norm = "model.norm"
    for n in names:
        if n.startswith(f"{layers_path}.") or not n.endswith(".weight"):
            continue
        mod = n[: -len(".weight")]
        last = mod.rsplit(".", 1)[-1]
        if last in _LM_HEAD_NAMES:
            lm_head = mod
        elif _is_norm(last):
            pre_norm = mod
    return ModelDef(
        tree,
        lm_head=lm_head,
        pre_lm_head_norm=pre_norm,
        detected_num_experts=num_experts,
    )
