"""Declarative quantization protocol (stages → rules → targets) → config.

TPU-native counterpart of the reference's next-gen protocol draft
(reference gptqmodel/quantization/protocol.py:16-528): a versioned
YAML/dict document selects module sets with ``match`` patterns
(``+:include`` / ``-:exclude``) and attaches per-target ``prepare`` /
``quantize`` / ``export`` specs. The shipped compiler subset (matching the
reference's "initial implementation") lowers a single-stage, single-rule
weight target onto :class:`~gptqmodel_tpu.quantization.config.QuantizeConfig`:

- ``weight.quantize.method`` ∈ {gptq, awq} with bits / group_size / sym /
  desc_act / act_group_aware args;
- ``weight.export`` picks the on-disk FORMAT variant (gptq / gptq_v2 /
  gptq_p for GPTQ; gemm / gemv / gemv_fast for AWQ);
- negative matchers become the config's dynamic ``-:pattern`` overrides
  (module-exclusion semantics shared with QuantizeConfig.dynamic);
- ``weight.prepare: smooth.<method>`` maps onto ``qcfg.smooth`` (our
  Smoother preprocessor covers all 8 SmoothMethods, so unlike the
  reference draft this is accepted for GPTQ/AWQ too, not just GGUF).

The schema is content-compatible by necessity (same on-disk documents);
the implementation is a compact normalizer + compiler over our config.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, is_dataclass
from pathlib import Path
from typing import Any, Mapping, Optional

from gptqmodel_tpu.quantization.config import FORMAT, METHOD, QuantizeConfig


@dataclass(frozen=True)
class OperationSpec:
    method: str
    args: dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class QuantizeSpec:
    method: Optional[str] = None
    args: dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class ExportSpec:
    format: Optional[str] = None
    variant: Optional[str] = None
    options: dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class TargetSpec:
    mode: Optional[str] = None
    prepare: tuple[OperationSpec, ...] = ()
    quantize: Optional[QuantizeSpec] = None
    export: Optional[ExportSpec] = None


@dataclass(frozen=True)
class MatchSpec:
    pattern: str
    include: bool = True

    def matches(self, module_name: str) -> bool:
        if self.pattern == "*":
            return True
        return re.search(self.pattern, module_name) is not None


@dataclass(frozen=True)
class Rule:
    match: tuple[MatchSpec, ...]
    weight: Optional[TargetSpec] = None
    input: Optional[TargetSpec] = None
    output: Optional[TargetSpec] = None
    kv_cache: Optional[TargetSpec] = None

    def matches(self, module_name: str) -> bool:
        inc = [m for m in self.match if m.include]
        if not inc or not any(m.matches(module_name) for m in inc):
            return False
        return not any(
            m.matches(module_name) for m in self.match if not m.include
        )


@dataclass(frozen=True)
class Stage:
    name: str
    rules: tuple[Rule, ...] = ()


@dataclass(frozen=True)
class ExecutionPlan:
    version: int
    stages: tuple[Stage, ...]


def _as_mapping(src: Any, what: str) -> dict[str, Any]:
    if isinstance(src, Mapping):
        return dict(src)
    if is_dataclass(src):
        return {f: getattr(src, f) for f in src.__dataclass_fields__}
    raise TypeError(f"protocol {what} must be a mapping (got {type(src)})")


def _parse_selector(src: Any) -> MatchSpec:
    if isinstance(src, MatchSpec):
        return src
    if not isinstance(src, str) or not src.strip():
        raise ValueError(f"match selector must be a non-empty string: {src!r}")
    s = src.strip()
    include = True
    if s.startswith("+:"):
        s = s[2:].strip()
    elif s.startswith("-:"):
        include, s = False, s[2:].strip()
    if not s:
        raise ValueError("match selector pattern must not be empty")
    return MatchSpec(pattern=s, include=include)


def _parse_match(src: Any) -> tuple[MatchSpec, ...]:
    if isinstance(src, (str, MatchSpec)):
        return (_parse_selector(src),)
    if isinstance(src, (list, tuple)) and src:
        return tuple(_parse_selector(s) for s in src)
    raise ValueError("rule requires a non-empty `match`")


def _parse_op(src: Any) -> OperationSpec:
    if isinstance(src, OperationSpec):
        return src
    if isinstance(src, str):
        return OperationSpec(method=src)
    d = _as_mapping(src, "operation")
    m = d.pop("method", None)
    if not m:
        raise ValueError("operation requires a `method`")
    return OperationSpec(method=str(m), args=d)


def _parse_quantize(src: Any) -> Optional[QuantizeSpec]:
    if src is None or isinstance(src, QuantizeSpec):
        return src
    if isinstance(src, str):
        return QuantizeSpec(method=src)
    d = _as_mapping(src, "quantize")
    m = d.pop("method", None)
    return QuantizeSpec(method=str(m) if m is not None else None, args=d)


def _parse_export(src: Any) -> Optional[ExportSpec]:
    if src is None or isinstance(src, ExportSpec):
        return src
    if isinstance(src, str):
        return ExportSpec(format=src)
    d = _as_mapping(src, "export")
    return ExportSpec(format=d.get("format"), variant=d.get("variant"),
                      options=dict(d.get("options") or {}))


def _parse_target(src: Any) -> Optional[TargetSpec]:
    if src is None or isinstance(src, TargetSpec):
        return src
    d = _as_mapping(src, "target")
    return TargetSpec(
        mode=d.get("mode"),
        prepare=tuple(_parse_op(o) for o in d.get("prepare") or ()),
        quantize=_parse_quantize(d.get("quantize")),
        export=_parse_export(d.get("export")),
    )


def _parse_rule(src: Any) -> Rule:
    if isinstance(src, Rule):
        return src
    d = _as_mapping(src, "rule")
    return Rule(
        match=_parse_match(d.get("match")),
        weight=_parse_target(d.get("weight")),
        input=_parse_target(d.get("input")),
        output=_parse_target(d.get("output")),
        kv_cache=_parse_target(d.get("kv_cache")),
    )


def compile_protocol(source: Any) -> ExecutionPlan:
    """Normalize a dict/dataclass protocol document into an ExecutionPlan."""
    d = _as_mapping(source, "root")
    version = int(d.get("version", 2))
    if version != 2:
        raise ValueError(f"unsupported protocol version: {version}")
    stages = []
    for s in d.get("stages") or ():
        sd = _as_mapping(s, "stage") if not isinstance(s, Stage) else None
        if isinstance(s, Stage):
            stages.append(s)
            continue
        name = sd.get("name")
        if not name:
            raise ValueError("stage requires a non-empty `name`")
        rules = tuple(_parse_rule(r) for r in sd.get("rules") or ())
        if not rules:
            raise ValueError(f"stage `{name}` must define at least one rule")
        stages.append(Stage(name=str(name), rules=rules))
    if not stages:
        raise ValueError("protocol must define at least one stage")
    return ExecutionPlan(version=version, stages=tuple(stages))


def compile_protocol_yaml_text(text: str) -> ExecutionPlan:
    import yaml

    return compile_protocol(yaml.safe_load(text))


def compile_protocol_yaml_file(path: str | Path) -> ExecutionPlan:
    return compile_protocol_yaml_text(Path(path).read_text())


# ------------------------------------------------------------------ compiler

_GPTQ_VARIANTS = {
    "gptq": FORMAT.GPTQ, "gptq_v2": FORMAT.GPTQ_V2, "gptq_p": FORMAT.GPTQ_P,
}
_AWQ_VARIANTS = {
    "gemm": FORMAT.AWQ_GEMM, "gemv": FORMAT.AWQ_GEMV,
    "gemv_fast": FORMAT.AWQ_GEMV_FAST, "gemvfast": FORMAT.AWQ_GEMV_FAST,
}


def compile_plan_to_quantize_config(plan: ExecutionPlan) -> QuantizeConfig:
    """Lower the shipped single-stage/single-rule weight-target subset
    (reference protocol.py:123-146 semantics) onto QuantizeConfig."""
    if len(plan.stages) != 1:
        raise NotImplementedError("config compilation supports exactly one stage")
    stage = plan.stages[0]
    if len(stage.rules) != 1:
        raise NotImplementedError("config compilation supports exactly one rule")
    rule = stage.rules[0]
    if rule.input or rule.output or rule.kv_cache:
        raise NotImplementedError("only weight-target compilation is supported")
    w = rule.weight
    if w is None:
        raise ValueError("protocol requires a `weight` target")
    if w.mode not in (None, "merge"):
        raise NotImplementedError("only the default merge mode is supported")
    q = w.quantize
    if q is None or not q.method:
        raise ValueError("weight target requires `weight.quantize.method`")

    includes = [m for m in rule.match if m.include]
    if not includes or any(m.pattern != "*" for m in includes):
        raise NotImplementedError(
            'config compilation supports only match="*" (+ "-:" excludes)')
    dynamic = {
        f"-:{m.pattern}": {} for m in rule.match if not m.include
    } or None

    method = METHOD(str(q.method).strip().lower())
    if method not in (METHOD.GPTQ, METHOD.AWQ):
        raise NotImplementedError(f"unsupported protocol method: {method}")

    bits = q.args.get("bits")
    if bits is None:
        raise ValueError("weight target requires `weight.quantize.bits`")

    fmt = FORMAT.GPTQ if method == METHOD.GPTQ else FORMAT.AWQ_GEMM
    if w.export is not None:
        if w.export.format not in (None, method.value):
            raise NotImplementedError(
                f"export format {w.export.format!r} doesn't match {method}")
        if w.export.variant is not None:
            v = str(w.export.variant).strip().lower().replace("-", "_")
            table = _GPTQ_VARIANTS if method == METHOD.GPTQ else _AWQ_VARIANTS
            if v not in table:
                raise NotImplementedError(f"unsupported export variant: {v}")
            fmt = table[v]

    kw: dict[str, Any] = dict(
        method=method, format=fmt, bits=int(bits),
        group_size=int(q.args.get("group_size", 128)),
        sym=bool(q.args.get("sym", True)), dynamic=dynamic,
    )
    if method == METHOD.GPTQ:
        kw["desc_act"] = bool(q.args.get("desc_act", False))
        if "act_group_aware" in q.args:
            kw["act_group_aware"] = bool(q.args["act_group_aware"])

    # weight.prepare: smooth.<method> -> the model-wide Smoother
    # preprocessor (quantization/smooth.py covers all 8 SmoothMethods)
    if w.prepare:
        if len(w.prepare) != 1:
            raise NotImplementedError("at most one weight.prepare operation")
        op = w.prepare[0]
        if not (op.method == "smoother" or op.method.startswith("smooth")):
            raise NotImplementedError(
                f"unsupported weight.prepare operation: {op.method}")
        name = (op.method.split(".", 1)[1] if "." in op.method
                else op.args.get("type", "mad"))
        kw["smooth"] = dict(op.args, type=name)  # smooth_weight spec dict

    return QuantizeConfig(**kw)


def compile_protocol_to_quantize_config(source: Any) -> QuantizeConfig:
    return compile_plan_to_quantize_config(compile_protocol(source))


def compile_protocol_yaml_to_quantize_config(text: str) -> QuantizeConfig:
    return compile_plan_to_quantize_config(compile_protocol_yaml_text(text))
