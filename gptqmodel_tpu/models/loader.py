"""HF checkpoint reader → params pytree (dense and quantized).

TPU-native analog of the reference ModelLoader (gptqmodel/models/loader.py:
``from_pretrained`` :650 / ``from_quantized`` :967) without torch/accelerate:
safetensors shards are read directly into numpy (bf16 via ml_dtypes), layers
can be materialized one at a time (the LazyTurtle / offload_to_disk
equivalent — weights stay on disk until a layer is quantized,
reference structure.py:3035), and quantized checkpoints reconstruct
``QuantLinear`` pytrees from qweight/qzeros/scales/g_idx groups with v1→v2
zero-point conversion at load (reference loader.py:1669).
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Iterable

import numpy as np
from safetensors import safe_open

from gptqmodel_tpu.ops import pack as packing
from gptqmodel_tpu.ops.qlinear import QuantLinear
from gptqmodel_tpu.quantization.config import FORMAT, QuantizeConfig

_LAYER_RE = re.compile(r"^(.*?\.(?:layers|h|blocks))\.(\d+)\.(.*)$")


class CheckpointReader:
    """Index + mmap-backed access to a sharded safetensors checkpoint."""

    def __init__(self, model_dir: str | Path):
        self.dir = Path(model_dir)
        index_file = self.dir / "model.safetensors.index.json"
        self._name_to_file: dict[str, Path] = {}
        if index_file.exists():
            weight_map = json.loads(index_file.read_text())["weight_map"]
            for name, fname in weight_map.items():
                self._name_to_file[name] = self.dir / fname
        else:
            files = sorted(self.dir.glob("*.safetensors"))
            if not files:
                raise FileNotFoundError(f"no .safetensors files in {self.dir}")
            for f in files:
                with safe_open(f, framework="np") as fh:
                    for name in fh.keys():
                        self._name_to_file[name] = f
        self._handles: dict[Path, object] = {}

    def names(self) -> Iterable[str]:
        return self._name_to_file.keys()

    def _handle(self, f: Path):
        if f not in self._handles:
            self._handles[f] = safe_open(f, framework="np")
        return self._handles[f]

    def get(self, name: str) -> np.ndarray:
        return self._handle(self._name_to_file[name]).get_tensor(name)

    def __contains__(self, name: str) -> bool:
        return name in self._name_to_file


def _insert(tree: dict, parts: list[str], leaf_key: str, value):
    node = tree
    for p in parts:
        node = node.setdefault(p, {})
    node[leaf_key] = value


def _group_module_tensors(names: Iterable[str]) -> dict[str, dict[str, str]]:
    """full tensor name -> {module_path: {leaf: tensor_name}}."""
    modules: dict[str, dict[str, str]] = {}
    for name in names:
        mod, _, leaf = name.rpartition(".")
        modules.setdefault(mod, {})[leaf] = name
    return modules


_QUANT_LEAVES = {"qweight", "qzeros", "scales"}


def build_params_tree(
    reader: CheckpointReader,
    qcfg: QuantizeConfig | None = None,
    layer_filter: int | None = None,
    skip_layers: bool = False,
    conv1d_suffixes: tuple = (),
    layer_container: str | None = None,
) -> dict:
    """Materialize the params pytree from a checkpoint.

    ``layer_filter=i`` loads only decoder layer ``i`` (plus nothing else);
    ``skip_layers=True`` loads everything EXCEPT decoder layers (embeddings,
    final norm, lm_head) — together these give layer-streaming quantization
    with one layer resident (reference offload_to_disk equivalent).
    ``conv1d_suffixes``: module-path suffixes whose dense weights are stored
    [in, out] (gpt2 Conv1D) — canonicalized to [out, in] here (the writer
    reverses this; packed modules are layout-identical to Linear and
    untouched).
    """
    tree: dict = {}
    # ``layer_container`` (e.g. "model.layers" from ModelDef.layers_container)
    # restricts decoder-layer streaming to THE decoder container: VL models
    # carry a second indexed stack (model.visual.blocks / vision_tower...
    # encoder.layers) that must load as plain weights, never as "layers"
    layer_re = (
        re.compile(rf"^({re.escape(layer_container)})\.(\d+)\.(.*)$")
        if layer_container else _LAYER_RE
    )
    modules = _group_module_tensors(reader.names())

    # bitsandbytes NF4 modules: {mod}.weight (packed) + a {mod}.weight.*
    # subtree (absmax/quant_map/quant_state...) — collect them first
    bnb_bases = {
        mp[: -len(".weight")]
        for mp, lv in modules.items()
        if mp.endswith(".weight") and "quant_map" in lv
    }
    skip_paths = set()
    for base in sorted(bnb_bases):
        consumed = [
            mp for mp in modules
            if mp == base or mp.startswith(base + ".weight")
        ]
        skip_paths.update(consumed)
        m = layer_re.match(base)
        path = base
        if m is not None:
            if skip_layers:
                continue
            if layer_filter is not None:
                if int(m.group(2)) != layer_filter:
                    continue
                path = m.group(3)
        elif layer_filter is not None:
            continue
        value = _load_bnb4(reader, modules, base)
        parts = path.split(".")
        _insert_module(tree, parts[:-1], parts[-1], value)

    for mod_path, leaves in modules.items():
        if mod_path in skip_paths:
            continue
        m = layer_re.match(mod_path)
        if m is not None:
            layer_idx = int(m.group(2))
            if skip_layers:
                continue
            if layer_filter is not None:
                if layer_idx != layer_filter:
                    continue
                mod_path = m.group(3)  # re-root: tree is the layer itself
        elif layer_filter is not None:
            continue

        is_quant = _QUANT_LEAVES.issubset(leaves.keys()) or (
            {"qweight", "scales"}.issubset(leaves.keys())
            and "scaled_zeros" in leaves  # gemv-fast legacy zeros alias
        )
        is_fp8 = "weight_scale" in leaves and "weight" in leaves
        is_fp4 = "qweight_fp4" in leaves
        is_trellis = {"trellis", "suh", "svh"}.issubset(leaves.keys())
        parts = mod_path.split(".") if mod_path else []
        if is_trellis:
            from gptqmodel_tpu.ops.trellis import make_trellis_linear

            trellis = reader.get(leaves["trellis"])
            K = trellis.shape[2] // 16
            # codebook tag tensors mark the decoder (reference quantize.py:1052)
            cb = "mcg" if "mcg" in leaves else (
                "mul1" if "mul1" in leaves else "3inst"
            )
            value = make_trellis_linear(
                trellis=trellis,
                suh=reader.get(leaves["suh"]),
                svh=reader.get(leaves["svh"]),
                bias=reader.get(leaves["bias"]) if "bias" in leaves else None,
                K=K,
                cb=cb,
            )
            _insert_module(tree, parts[:-1], parts[-1], value)
        elif is_quant:
            if qcfg is None:
                raise ValueError(
                    f"{mod_path} holds packed tensors but no QuantizeConfig given"
                )
            value = _load_quant_linear(reader, leaves, qcfg, mod_path)
            _insert_module(tree, parts[:-1], parts[-1], value)
        elif is_fp4:
            from gptqmodel_tpu.ops.fp8 import Fp4Linear

            codes = reader.get(leaves["qweight_fp4"])
            scales = reader.get(leaves["scales"])
            in_f = codes.shape[0] * 2
            g = in_f // scales.shape[0]
            value = Fp4Linear(
                codes_u8=codes,
                scales=scales,
                bias=reader.get(leaves["bias"]) if "bias" in leaves else None,
                in_features=in_f,
                out_features=codes.shape[1],
                group_size=g,
            )
            _insert_module(tree, parts[:-1], parts[-1], value)
        elif is_fp8:
            from gptqmodel_tpu.ops.fp8 import Fp8Linear

            w = reader.get(leaves["weight"])
            value = Fp8Linear(
                weight_u8=w.view(np.uint8) if w.dtype != np.uint8 else w,
                scale=reader.get(leaves["weight_scale"]).astype(np.float32),
                bias=reader.get(leaves["bias"]) if "bias" in leaves else None,
                in_features=w.shape[1],
                out_features=w.shape[0],
            )
            _insert_module(tree, parts[:-1], parts[-1], value)
        else:
            is_conv1d = any(mod_path.endswith(sfx) for sfx in conv1d_suffixes)
            for leaf, tensor_name in leaves.items():
                t = reader.get(tensor_name)
                if is_conv1d and leaf == "weight":
                    t = np.ascontiguousarray(t.T)
                _insert_module(tree, parts, leaf, t)
    _inject_runtime_layer_params(tree, layer_filter)
    _listify_layers(tree)
    return tree


def _inject_runtime_layer_params(tree: dict, layer_filter: int | None):
    """Derive runtime-only per-layer params (``_``-prefixed; the writer
    skips them on export). Currently: diffllama's lambda_init constant
    ``0.8 - 0.6*exp(-0.3*layer_idx)`` (modeling_diffllama.py:117), stored
    as ``self_attn._lam_init`` so the jitted layer fns stay layer-generic."""
    import math

    def lam(i: int):
        return np.float32(0.8 - 0.6 * math.exp(-0.3 * i))

    def inject(sa: dict, i: int):
        if "lambda_q1" in sa:  # diffllama
            sa["_lam_init"] = lam(i)
        if "output_gate" in sa and "slope_rate" not in sa:
            # minimax lightning layers missing the persisted slope buffer:
            # the forward re-derives slopes from the layer index
            sa["_layer_idx"] = np.int32(i)

    if layer_filter is not None:  # tree IS the (re-rooted) layer
        sa = tree.get("self_attn")
        if isinstance(sa, dict):
            inject(sa, layer_filter)
        return
    for root in tree.values():
        if not isinstance(root, dict):
            continue
        layers = root.get("layers")
        if not isinstance(layers, dict):
            continue
        for idx, lp in layers.items():
            sa = lp.get("self_attn") if isinstance(lp, dict) else None
            if isinstance(sa, dict):
                inject(sa, int(idx))


def _insert_module(tree: dict, parts: list[str], leaf_key: str, value):
    _insert(tree, parts, leaf_key, value)


def _load_quant_linear(
    reader: CheckpointReader, leaves: dict[str, str], qcfg: QuantizeConfig, mod_path: str
) -> QuantLinear:
    mcfg = qcfg.for_module(mod_path) or qcfg
    qweight = reader.get(leaves["qweight"])
    if "qzeros" not in leaves and "scaled_zeros" in leaves:
        # legacy gemv-fast alias (reference gemv_fast_awq.py:214)
        leaves = dict(leaves, qzeros=leaves["scaled_zeros"])
    qzeros = reader.get(leaves["qzeros"])
    scales = reader.get(leaves["scales"])
    g_idx = reader.get(leaves["g_idx"]) if "g_idx" in leaves else None
    bias = reader.get(leaves["bias"]) if "bias" in leaves else None
    bits = mcfg.bits
    if qcfg.format == FORMAT.AWQ_GEMM:
        # AutoAWQ checkpoint: out-dim interleaved pack, true zeros, scales
        # transposed relative to nothing — [in/g, out] already matches
        qweight, qzeros = packing.awq_gemm_to_gptq(qweight, qzeros, bits)
    elif qcfg.format == FORMAT.AWQ_GEMV:
        g = mcfg.group_size if mcfg.group_size > 0 else qweight.shape[1] * 32 // bits
        qweight, qzeros, scales = packing.awq_gemv_to_gptq(
            qweight, qzeros, scales, group_size=g, bits=bits
        )
    elif qcfg.format == FORMAT.AWQ_GEMV_FAST:
        g = mcfg.group_size if mcfg.group_size > 0 else qweight.shape[1]
        qweight, qzeros, scales = packing.awq_gemv_fast_to_gptq(
            qweight, scales, qzeros, group_size=g, bits=bits
        )
    in_f = qweight.shape[0] * 32 // bits
    out_f = scales.shape[1]
    planar = qcfg.format == FORMAT.GPTQ_P
    v1_on_disk = qcfg.format == FORMAT.GPTQ
    if v1_on_disk:
        # convert to v2 (true zeros) once at load — runtime format
        qzeros = packing.convert_qzeros_v1_to_v2(qzeros, bits)
    had_block = 0
    if mcfg.rotation and "online" in mcfg.rotation and mod_path.rsplit(".", 1)[
        -1
    ] in ("down_proj", "w2", "fc2", "dense_4h_to_h", "c_proj"):
        had_block = in_f & (-in_f)  # largest power-of-two divisor
        if had_block < 2:
            had_block = 0
    g = mcfg.group_size if mcfg.group_size > 0 else in_f
    if g_idx is not None and np.array_equal(
        g_idx, (np.arange(in_f) // g).astype(g_idx.dtype)
    ):
        g_idx = None
    rot_theta = reader.get(leaves["paro_theta"]) if "paro_theta" in leaves else None
    rot_scales = (
        reader.get(leaves["paro_scales"]) if "paro_scales" in leaves else None
    )
    rot_group = 0
    if rot_theta is not None:
        rot_group = int((mcfg.paroquant or {}).get("rot_group", 128))
        rot_group = min(rot_group, in_f)
        while in_f % rot_group:
            rot_group //= 2
    return QuantLinear(
        qweight=qweight,
        qzeros=qzeros,
        scales=scales,
        g_idx=g_idx,
        bias=bias,
        rot_theta=rot_theta,
        rot_scales=rot_scales,
        rot_group=rot_group,
        bits=bits,
        group_size=mcfg.group_size,
        in_features=in_f,
        out_features=out_f,
        sym=mcfg.sym,
        v1=False,
        planar=planar,
        a8=str(mcfg.method) == "qqq",
        had_block=had_block,
    )


def _listify_layers(tree: dict):
    """Convert CONTIGUOUS all-digit-keyed dicts ({"0": .., "1": ..}) to
    lists in-place (decoder layers, MoE experts, any ModuleList analog).
    Gapped digit dicts (nn.Sequential with parameter-free slots, e.g.
    qwen2_vl visual.merger.mlp.{0,2}) stay dicts — the writer flattens
    either form back to the same names."""
    for key, val in list(tree.items()):
        if isinstance(val, dict):
            if val and all(k.isdigit() for k in val) and set(val) == {
                str(i) for i in range(len(val))
            }:
                lst = [val[str(i)] for i in range(len(val))]
                tree[key] = lst
                for sub in lst:
                    if isinstance(sub, dict):
                        _listify_layers(sub)
            else:
                _listify_layers(val)


def _load_bnb4(reader: CheckpointReader, modules: dict, base: str):
    """Reconstruct a Bnb4Linear from bitsandbytes-serialized tensors."""
    from gptqmodel_tpu.ops.bnb import (
        dequant_nested_absmax,
        make_bnb4_linear,
        parse_quant_state,
    )

    st = modules[base + ".weight"]
    packed = reader.get(modules[base]["weight"])
    quant_map = reader.get(st["quant_map"])
    absmax = reader.get(st["absmax"])
    state = {}
    qs_mod = modules.get(base + ".weight.quant_state", {})
    for leaf, tname in qs_mod.items():
        if leaf.startswith("bitsandbytes__"):
            state = parse_quant_state(reader.get(tname))
    if absmax.dtype == np.uint8:  # double-quantized
        absmax = dequant_nested_absmax(
            absmax,
            reader.get(st["nested_quant_map"]),
            reader.get(st["nested_absmax"]),
            float(state.get("nested_offset", 0.0)),
            int(state.get("nested_blocksize", 256)),
        )
    shape = tuple(state.get("shape") or ())
    if not shape:
        raise ValueError(f"bnb module {base}: quant_state missing shape")
    bias = (
        reader.get(modules[base]["bias"]) if "bias" in modules[base] else None
    )
    return make_bnb4_linear(
        packed, absmax, quant_map, shape,
        blocksize=int(state.get("blocksize", 64)), bias=bias,
    )
