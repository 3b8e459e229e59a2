"""Module-tree DSL: declarative per-arch quantization structure.

Keeps the reference's best idea (SURVEY §2.2; reference parse at
gptqmodel/models/base.py:443-470): each architecture declares a small tree
instead of code. Syntax:

- list form: ``["model", "layers", "#", {subtree}]`` — segments before ``#``
  are the path to the repeated decoder-layer list; ``#`` is the layer index.
- dict keys are submodule names, optionally flagged: ``"mlp:moe:?"`` —
  ``:moe`` marks an expert subtree, ``:?`` optional (absent in some layers).
- an ``"experts"`` child with a ``{"#": (...)}`` entry expands per expert
  index (count from the HF config field named by ``dynamic_expert_index``).
- leaf tuples hold ``"name:N"`` (quantize, subset/stage N — true_sequential
  grouping), ``"name:!"`` (capture-only: not quantized, activations observed
  for AWQ scale search). A leaf whose name equals its parent key refers to
  the parent module itself (e.g. ``"input_layernorm": ("input_layernorm:!",)``).

Parsing yields a ``LayerPlan`` of relative module paths; ``build_subsets``
expands expert templates into concrete per-layer paths grouped by subset
index — the unit the looper forwards + quantizes together.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ModuleEntry:
    """One quantizable (or capture-only) module, relative to its layer."""

    path: str  # e.g. "self_attn.q_proj" or "mlp.experts.#.gate_proj"
    subset: int  # stage index within the layer (-1 for capture-only)
    capture_only: bool = False
    is_expert: bool = False  # path contains an expert "#"
    in_moe: bool = False  # lives under a ":moe" subtree
    optional: bool = False  # under a ":?" subtree

    def expand(self, expert: int) -> str:
        return self.path.replace("#", str(expert))


@dataclass
class LayerPlan:
    layers_path: str  # e.g. "model.layers"
    entries: list[ModuleEntry] = field(default_factory=list)

    @property
    def capture_paths(self) -> list[str]:
        return [e.path for e in self.entries if e.capture_only]

    @property
    def has_moe(self) -> bool:
        return any(e.is_expert for e in self.entries)

    def quant_entries(self) -> list[ModuleEntry]:
        return [e for e in self.entries if not e.capture_only]

    def build_subsets(self, num_experts: int | None = None) -> list[list[str]]:
        """Concrete per-layer subsets in execution order.

        Expert templates expand to ``num_experts`` paths inside the same
        subset (reference groups all experts' same-stage projections into one
        subset so a single forward pass feeds them all,
        stage_subset.py:393).
        """
        n_subsets = 1 + max((e.subset for e in self.quant_entries()), default=-1)
        subsets: list[list[str]] = [[] for _ in range(n_subsets)]
        for e in self.quant_entries():
            if e.is_expert:
                if num_experts is None:
                    raise ValueError(
                        f"module {e.path} needs num_experts (dynamic_expert_index)"
                    )
                subsets[e.subset].extend(e.expand(i) for i in range(num_experts))
            else:
                subsets[e.subset].append(e.path)
        return [s for s in subsets if s]


def parse_module_tree(tree: list) -> LayerPlan:
    """Parse the list-form DSL into a LayerPlan."""
    prefix: list[str] = []
    i = 0
    while i < len(tree) and isinstance(tree[i], str):
        if tree[i] == "#":
            i += 1
            break
        prefix.append(tree[i])
        i += 1
    if i >= len(tree) or not isinstance(tree[i], dict):
        raise ValueError(f"module_tree must end in a '#' + dict, got: {tree!r}")
    plan = LayerPlan(layers_path=".".join(prefix))
    _walk(tree[i], [], set(), plan)
    # stable order: by subset then declaration order (entries appended in
    # declaration order already; sort is stable)
    plan.entries.sort(key=lambda e: (e.subset if not e.capture_only else -1))
    return plan


def _split_flags(key: str) -> tuple[str, set[str]]:
    parts = key.split(":")
    return parts[0], set(parts[1:])


def _walk(node, prefix: list[str], flags: set[str], plan: LayerPlan):
    if isinstance(node, dict):
        for key, val in node.items():
            name, kflags = _split_flags(key)
            # "" key = leaves live on the PARENT module (reference deepseek_v2
            # tree's dense-mlp alternative entries)
            new_prefix = prefix + [name] if name else prefix
            _walk(val, new_prefix, flags | kflags, plan)
    elif isinstance(node, (tuple, list)):
        for leaf in node:
            name, tags = _split_flags(leaf)
            if prefix and name == prefix[-1]:
                path_parts = prefix  # leaf == parent key -> parent is module
            else:
                path_parts = prefix + [name]
            path = ".".join(path_parts)
            capture = "!" in tags
            subset_tags = [t for t in tags if t.isdigit()]
            subset = int(subset_tags[0]) if subset_tags else 0
            plan.entries.append(
                ModuleEntry(
                    path=path,
                    subset=-1 if capture else subset,
                    capture_only=capture,
                    is_expert="#" in path_parts,
                    in_moe="moe" in flags,
                    optional="?" in flags,
                )
            )
    else:
        raise ValueError(f"bad module_tree node: {node!r}")
