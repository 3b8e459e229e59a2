"""Auto module-tree detection from checkpoint tensor names (tree_detect.py).

Detection must reproduce the handwritten per-arch plans (paths, subsets,
capture flags) from nothing but tensor-name lists — the analog of the
reference's per-arch definition classes (gptqmodel/models/definitions/)."""

import pytest

from gptqmodel_tpu.models.definitions import (
    _GPT2_TREE,
    _LLAMA_TREE,
    _OPT_TREE,
    get_model_def,
)
from gptqmodel_tpu.models.module_tree import parse_module_tree
from gptqmodel_tpu.models.tree_detect import detect_model_def, detect_module_tree


def _plan_key(plan, n_experts=None):
    """Comparable summary: (capture set, subsets-in-order)."""
    return (
        frozenset(plan.capture_paths),
        tuple(tuple(sorted(s)) for s in plan.build_subsets(n_experts)),
    )


def _names_from_tree(tree, n_layers=2, n_experts=None, extra=()):
    """Expand a DSL tree back into plausible checkpoint tensor names."""
    plan = parse_module_tree(list(tree))
    names = []
    for li in range(n_layers):
        for e in plan.entries:
            paths = (
                [e.expand(i) for i in range(n_experts)] if e.is_expert
                else [e.path]
            )
            for p in paths:
                names.append(f"{plan.layers_path}.{li}.{p}.weight")
    return names + list(extra)


@pytest.mark.parametrize("tree", [_LLAMA_TREE, _OPT_TREE, _GPT2_TREE])
def test_detect_matches_handwritten_plans(tree):
    names = _names_from_tree(tree)
    detected, n_exp = detect_module_tree(names)
    assert n_exp is None
    want = parse_module_tree(list(tree))
    got = parse_module_tree(list(detected))
    assert got.layers_path == want.layers_path
    assert _plan_key(got) == _plan_key(want)


def test_detect_moe_experts_and_router():
    names = []
    for li in range(2):
        p = f"model.layers.{li}"
        names += [f"{p}.input_layernorm.weight",
                  f"{p}.self_attn.q_norm.weight",
                  f"{p}.self_attn.k_norm.weight"]
        names += [f"{p}.self_attn.{m}.weight"
                  for m in ("q_proj", "k_proj", "v_proj", "o_proj")]
        names += [f"{p}.post_attention_layernorm.weight",
                  f"{p}.mlp.gate.weight"]
        for ei in range(4):
            names += [f"{p}.mlp.experts.{ei}.{m}.weight"
                      for m in ("gate_proj", "up_proj", "down_proj")]
    tree, n_exp = detect_module_tree(names)
    assert n_exp == 4
    plan = parse_module_tree(list(tree))
    assert "mlp.gate" in plan.capture_paths  # router captured, not quantized
    assert "self_attn.q_norm" in plan.capture_paths
    subsets = plan.build_subsets(n_exp)
    flat = [m for s in subsets for m in s]
    assert "mlp.experts.3.up_proj" in flat
    # output projections stage AFTER their inputs
    s_of = {m: i for i, s in enumerate(subsets) for m in s}
    assert s_of["self_attn.o_proj"] > s_of["self_attn.q_proj"]
    assert s_of["mlp.experts.0.down_proj"] > s_of["mlp.experts.0.gate_proj"]


def test_detect_model_def_head_and_norm():
    names = _names_from_tree(
        _OPT_TREE,
        extra=["model.decoder.embed_tokens.weight",
               "model.decoder.final_layer_norm.weight",
               "lm_head.weight"],
    )
    mdef = detect_model_def(names)
    assert mdef.lm_head == "lm_head"
    assert mdef.pre_lm_head_norm == "model.decoder.final_layer_norm"
    assert mdef.detected_num_experts is None


def test_detect_ignores_non_param_leaves():
    names = _names_from_tree(
        _LLAMA_TREE,
        extra=["model.layers.0.self_attn.rotary_emb.inv_freq"],
    )
    tree, _ = detect_module_tree(names)
    plan = parse_module_tree(list(tree))
    assert all("rotary" not in p.path for p in plan.entries)


def test_e2e_quantize_unknown_model_type():
    """A llama-shaped checkpoint with a made-up model_type quantizes through
    the auto-detected tree (looper passes reader names to get_model_def)."""
    import json
    import tempfile

    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from tests.test_e2e_quantize import _calib, _make_tiny

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        cfg_path = src / "config.json"
        cfg = json.loads(cfg_path.read_text())
        cfg["model_type"] = "frontier_llm_2030"
        for k in list(cfg):
            if k.startswith("architectures"):
                del cfg[k]
        cfg_path.write_text(json.dumps(cfg))

        m = GPTQModel.load(src, QuantizeConfig(bits=4, group_size=32))
        log_rows = m.quantize(_calib(8), batch_size=4)
        assert len(log_rows) == 2 * 7  # 2 layers x 7 linears, via detection
        quantized = {r["module"] for r in log_rows}
        assert any("self_attn.q_proj" in m_ for m_ in quantized)
        assert any("mlp.down_proj" in m_ for m_ in quantized)


def test_get_model_def_uses_detection_for_unknown_type():
    # unknown arch with OPT-shaped names -> detected plan, not llama fallback
    names = _names_from_tree(_OPT_TREE)
    mdef = get_model_def("totally_new_arch", tensor_names=names)
    plan = parse_module_tree(list(mdef.module_tree))
    assert plan.layers_path == "model.decoder.layers"
    # registered types ignore names entirely
    mdef2 = get_model_def("llama", tensor_names=names)
    assert mdef2.module_tree == _LLAMA_TREE
