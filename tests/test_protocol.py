"""Quantization protocol (declarative stages/rules/targets) tests.

Mirrors the reference draft's behaviors (reference
gptqmodel/quantization/protocol.py:16-528): YAML → ExecutionPlan →
QuantizeConfig for the shipped single-stage weight-target subset, match
selector semantics, and the negative-match → dynamic mapping — then goes
one step further than the draft by running a compiled config through the
real quantize pipeline.
"""

import numpy as np
import pytest

from gptqmodel_tpu.quantization.config import FORMAT, METHOD
from gptqmodel_tpu.quantization.protocol import (
    MatchSpec,
    compile_protocol,
    compile_protocol_yaml_text,
    compile_protocol_yaml_to_quantize_config,
)

YAML_GPTQ = """
version: 2
stages:
  - name: weights
    rules:
      - match: ["*", "-:lm_head", "-:.*gate$"]
        weight:
          quantize:
            method: gptq
            bits: 4
            group_size: 32
            sym: true
            desc_act: false
          export:
            format: gptq
            variant: gptq_v2
"""


def test_yaml_compiles_to_quantize_config():
    qcfg = compile_protocol_yaml_to_quantize_config(YAML_GPTQ)
    assert qcfg.method == METHOD.GPTQ
    assert qcfg.format == FORMAT.GPTQ_V2
    assert (qcfg.bits, qcfg.group_size, qcfg.sym, qcfg.desc_act) == (
        4, 32, True, False)
    assert qcfg.dynamic == {"-:lm_head": {}, "-:.*gate$": {}}


def test_awq_variant_and_defaults():
    qcfg = compile_protocol_yaml_to_quantize_config("""
version: 2
stages:
  - name: s
    rules:
      - match: "*"
        weight:
          quantize: {method: awq, bits: 4}
          export: {format: awq, variant: gemv_fast}
""")
    assert qcfg.method == METHOD.AWQ
    assert qcfg.format == FORMAT.AWQ_GEMV_FAST
    assert qcfg.group_size == 128 and qcfg.dynamic is None


def test_smooth_prepare_maps_to_qcfg_smooth():
    qcfg = compile_protocol_yaml_to_quantize_config("""
version: 2
stages:
  - name: s
    rules:
      - match: "*"
        weight:
          prepare:
            - {method: smooth.mad, k: 2.5}
          quantize: {method: gptq, bits: 8}
""")
    assert qcfg.smooth == {"k": 2.5, "type": "mad"}


def test_match_selector_semantics():
    plan = compile_protocol_yaml_text(YAML_GPTQ)
    rule = plan.stages[0].rules[0]
    assert rule.matches("model.layers.0.self_attn.q_proj")
    assert not rule.matches("lm_head")
    assert not rule.matches("model.layers.3.mlp.gate")
    assert rule.matches("model.layers.3.mlp.gate_proj")  # anchored exclude
    m = MatchSpec(pattern=r"layers\.[0-3]\.", include=True)
    assert m.matches("model.layers.2.mlp") and not m.matches("model.layers.12.mlp")


def test_unsupported_shapes_raise():
    with pytest.raises(ValueError):
        compile_protocol({"version": 1, "stages": []})
    with pytest.raises(ValueError):
        compile_protocol({"version": 2, "stages": []})
    two_stages = {
        "version": 2,
        "stages": [
            {"name": "a", "rules": [{"match": "*", "weight": {
                "quantize": {"method": "gptq", "bits": 4}}}]},
            {"name": "b", "rules": [{"match": "*", "weight": {
                "quantize": {"method": "gptq", "bits": 4}}}]},
        ],
    }
    from gptqmodel_tpu.quantization.protocol import (
        compile_protocol_to_quantize_config)

    with pytest.raises(NotImplementedError):
        compile_protocol_to_quantize_config(two_stages)
    with pytest.raises(ValueError):  # missing bits
        compile_protocol_to_quantize_config({
            "version": 2, "stages": [{"name": "s", "rules": [
                {"match": "*", "weight": {"quantize": {"method": "gptq"}}}]}]})
    with pytest.raises(NotImplementedError):  # non-global include
        compile_protocol_to_quantize_config({
            "version": 2, "stages": [{"name": "s", "rules": [
                {"match": "q_proj", "weight": {
                    "quantize": {"method": "gptq", "bits": 4}}}]}]})


def test_protocol_config_drives_real_quantize():
    """Beyond the reference draft (which has no runtime behind it): the
    compiled config runs the actual pipeline, and the dynamic excludes
    from the negative matchers are honored."""
    import tempfile

    from gptqmodel_tpu import GPTQModel
    from tests.test_e2e_quantize import _calib, _make_tiny

    qcfg = compile_protocol_yaml_to_quantize_config("""
version: 2
stages:
  - name: s
    rules:
      - match: ["*", "-:.*o_proj"]
        weight:
          quantize: {method: gptq, bits: 4, group_size: 32}
""")
    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        m = GPTQModel.load(src, qcfg)
        rows = m.quantize(_calib(8), batch_size=4)
        mods = {r["module"] for r in rows}
        assert not any(mod.endswith("o_proj") for mod in mods), mods
        assert any(mod.endswith("q_proj") for mod in mods)
