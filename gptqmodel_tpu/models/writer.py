"""Quantized-checkpoint writer.

TPU-native analog of the reference ModelWriter (gptqmodel/models/writer.py:
``save_quantized`` :558): flattens the params pytree back to HF tensor names,
shards safetensors by size, writes ``quantize_config.json`` + embeds
``quantization_config`` into config.json (with meta fingerprint), emits
quant_log.csv, and copies tokenizer/processor files verbatim.
"""

from __future__ import annotations

import csv
import json
import shutil
from pathlib import Path

import numpy as np
from safetensors.numpy import save_file

from gptqmodel_tpu.ops import pack as packing
from gptqmodel_tpu.ops.qlinear import QuantLinear
from gptqmodel_tpu.quantization.config import FORMAT, QuantizeConfig

DEFAULT_MAX_SHARD = 4 * 1024**3  # bytes, matches HF default "4GB"

_TOKENIZER_FILES = (
    "tokenizer.json",
    "tokenizer_config.json",
    "tokenizer.model",
    "special_tokens_map.json",
    "vocab.json",
    "merges.txt",
    "generation_config.json",
    "preprocessor_config.json",
    "chat_template.jinja",
)


def flatten_params(
    tree, prefix: str = "", out: dict | None = None, v1_zeros: bool = True,
    conv1d_suffixes: tuple = (),
) -> dict:
    """Nested pytree -> flat {hf_tensor_name: np.ndarray}.

    QuantLinear leaves expand into qweight/qzeros/scales[/g_idx][/bias];
    with ``v1_zeros`` (the default interchange format) runtime v2 zeros are
    converted to the v1 -1-offset form on disk (reference v2->v1 export,
    utils/model.py:900); ``v1_zeros=False`` exports FORMAT.GPTQ_V2 verbatim.
    Dense weights whose module path matches ``conv1d_suffixes`` are written
    back transposed ([in, out] Conv1D layout — the loader's inverse).
    """
    if out is None:
        out = {}
    from gptqmodel_tpu.ops.fp8 import Fp4Linear, Fp8Linear

    if isinstance(tree, Fp8Linear):
        out[f"{prefix}.weight"] = np.asarray(tree.weight_u8)  # e4m3 bits
        out[f"{prefix}.weight_scale"] = np.asarray(tree.scale)
        if tree.bias is not None:
            out[f"{prefix}.bias"] = np.asarray(tree.bias)
        return out
    from gptqmodel_tpu.ops.bnb import Bnb4Linear

    if isinstance(tree, Bnb4Linear):
        import json as _json

        out[f"{prefix}.weight"] = np.asarray(tree.codes_u8).reshape(-1, 1)
        out[f"{prefix}.weight.absmax"] = np.asarray(tree.absmax)
        out[f"{prefix}.weight.quant_map"] = np.asarray(tree.quant_map)
        state = {
            "blocksize": tree.blocksize, "quant_type": "nf4",
            "shape": [tree.out_features, tree.in_features],
            "dtype": "bfloat16",
        }
        out[f"{prefix}.weight.quant_state.bitsandbytes__nf4"] = np.frombuffer(
            _json.dumps(state).encode(), np.uint8
        ).copy()
        if tree.bias is not None:
            out[f"{prefix}.bias"] = np.asarray(tree.bias)
        return out
    if isinstance(tree, Fp4Linear):
        out[f"{prefix}.qweight_fp4"] = np.asarray(tree.codes_u8)  # e2m1 nibbles
        out[f"{prefix}.scales"] = np.asarray(tree.scales)
        if tree.bias is not None:
            out[f"{prefix}.bias"] = np.asarray(tree.bias)
        return out
    from gptqmodel_tpu.ops.trellis import TrellisLinear

    if isinstance(tree, TrellisLinear):
        # exllamav3 tensor layout (reference exl3_lib/quantize.py:1043-1062);
        # runtime-only w_rt decode cache is never exported
        out[f"{prefix}.trellis"] = np.asarray(tree.trellis).view(np.int16)
        out[f"{prefix}.suh"] = np.asarray(tree.suh, dtype=np.float16)
        out[f"{prefix}.svh"] = np.asarray(tree.svh, dtype=np.float16)
        if tree.cb == "mcg":
            out[f"{prefix}.mcg"] = np.array([0xCBAC1FED], np.uint32).view(np.int32)
        elif tree.cb == "mul1":
            out[f"{prefix}.mul1"] = np.array([0x83DCD12D], np.uint32).view(np.int32)
        if tree.bias is not None:
            out[f"{prefix}.bias"] = np.asarray(tree.bias)
        return out
    if isinstance(tree, QuantLinear):
        qzeros = np.asarray(tree.qzeros)
        if tree.planar:
            pass  # planar is always v2-zeros on disk; words saved verbatim
        elif not tree.v1 and v1_zeros:
            qzeros = packing.convert_qzeros_v2_to_v1(qzeros, tree.bits)
        elif tree.v1 and not v1_zeros:
            qzeros = packing.convert_qzeros_v1_to_v2(qzeros, tree.bits)
        qweight = np.asarray(tree.qweight)
        if tree.rt_layout:  # runtime layout -> interchange layout on disk
            qweight = packing.unrepack_rt(qweight, tree.bits, tree.rt_block_k, planar=tree.planar)
        if tree.act_perm is not None:  # desc_act runtime row order -> original
            codes = packing.unpack_qweight(qweight, tree.bits,
                                           planar=tree.planar)
            inv = np.argsort(np.asarray(tree.act_perm))
            qweight = packing.pack_qweight(codes[inv], tree.bits,
                                           planar=tree.planar)
        out[f"{prefix}.qweight"] = qweight
        out[f"{prefix}.qzeros"] = qzeros
        out[f"{prefix}.scales"] = np.asarray(tree.scales)
        g = tree.group_size if tree.group_size > 0 else tree.in_features
        g_idx = (
            np.asarray(tree.g_idx)
            if tree.g_idx is not None
            else (np.arange(tree.in_features, dtype=np.int32) // g)
        )
        out[f"{prefix}.g_idx"] = g_idx
        if tree.rot_theta is not None:  # ParoQuant transform params
            out[f"{prefix}.paro_theta"] = np.asarray(tree.rot_theta)
            out[f"{prefix}.paro_scales"] = np.asarray(tree.rot_scales)
        if tree.bias is not None:
            out[f"{prefix}.bias"] = np.asarray(tree.bias)
        return out
    if isinstance(tree, dict):
        for k, v in tree.items():
            if k.startswith("_"):  # runtime-only derived params (loader
                continue  # _inject_runtime_layer_params) never export
            if k in ("experts_stacked", "experts_stacked_q"):
                # runtime stacked forms (optimize.stack_moe_experts) unstack
                # back to per-expert checkpoint tensors — runtime layouts
                # never leak into exports
                _flatten_stacked_experts(v, prefix, out, v1_zeros)
                continue
            flatten_params(
                v, f"{prefix}.{k}" if prefix else k, out, v1_zeros,
                conv1d_suffixes,
            )
        return out
    if isinstance(tree, list):
        for i, v in enumerate(tree):
            flatten_params(v, f"{prefix}.{i}", out, v1_zeros, conv1d_suffixes)
        return out
    t = np.asarray(tree)
    if prefix.endswith(".weight") and any(
        prefix[: -len(".weight")].endswith(sfx) for sfx in conv1d_suffixes
    ):
        t = np.ascontiguousarray(t.T)
    out[prefix] = t
    return out


def _flatten_stacked_experts(st: dict, mlp_prefix: str, out: dict,
                             v1_zeros: bool):
    """Unstack runtime expert forms into per-expert checkpoint tensors.

    Projection names follow the container convention (mixtral's
    `block_sparse_moe` uses w1/w3/w2, everything else gate/up/down_proj) —
    the same inference optimize.stack_moe_experts made when stacking.

    Note: the stacked form holds scales as bf16 (kernel layout), so an
    export AFTER optimize() carries bf16-rounded scales — save before
    optimize() for bit-preserving exports; this path exists so the save is
    CORRECT (round-2 fix: it used to crash with dtype=object)."""
    mix = mlp_prefix.endswith("block_sparse_moe")
    g_n, u_n, d_n = ("w1", "w3", "w2") if mix else (
        "gate_proj", "up_proj", "down_proj"
    )

    from gptqmodel_tpu.ops.pallas_qmoe import StackedQuantExperts

    def emit_packed(sq: StackedQuantExperts, e: int, name: str,
                    col0: int, ncols: int):
        qw = np.asarray(sq.qweight[e])[:, col0 : col0 + ncols]
        if getattr(sq, "rt", False):
            # whole-K-tile rt runtime layout -> interchange before export
            # (runtime layouts never leak into checkpoints; the row perm is
            # column-independent so slicing first is exact)
            qw = packing.unrepack_rt(qw, sq.bits, sq.in_features)
        sc = np.asarray(sq.scales[e], np.float32)[: sq.G, col0 : col0 + ncols]
        zeros = np.full((sq.G, ncols), int(sq.zero_const), np.int64)
        ql = QuantLinear(
            qweight=qw,
            qzeros=packing.pack_qzeros(zeros, sq.bits, v1=False),
            scales=sc.astype(np.float16),
            g_idx=None, bias=None, bits=sq.bits,
            group_size=sq.in_features // sq.G,
            in_features=sq.in_features, out_features=ncols, sym=True,
        )
        flatten_params(ql, f"{mlp_prefix}.experts.{e}.{name}", out, v1_zeros)

    if any(isinstance(v, StackedQuantExperts) for v in st.values()):
        down = st["down"]
        E = down.qweight.shape[0]
        gu = st.get("gateup")
        for e in range(E):
            if gu is not None:
                F = gu.out_features // 2
                emit_packed(gu, e, g_n, 0, F)
                emit_packed(gu, e, u_n, F, F)
            else:
                emit_packed(st["gate"], e, g_n, 0, st["gate"].out_features)
                emit_packed(st["up"], e, u_n, 0, st["up"].out_features)
            emit_packed(down, e, d_n, 0, down.out_features)
        return

    # dense stacked [E, in, out] -> per-expert [out, in] weights
    E = np.shape(st["down"])[0]
    for e in range(E):
        for name, arr in ((g_n, st["gate"]), (u_n, st["up"]),
                          (d_n, st["down"])):
            out[f"{mlp_prefix}.experts.{e}.{name}.weight"] = np.ascontiguousarray(
                np.asarray(arr[e]).T
            )


def collect_adapters(tree, prefix: str = "", out: dict | None = None) -> dict:
    """Gather lora_A/lora_B leaves as ``{module}.lora_A`` tensors."""
    if out is None:
        out = {}
    from gptqmodel_tpu.ops.trellis import TrellisLinear

    if isinstance(tree, (QuantLinear, TrellisLinear)):
        if tree.lora_A is not None:
            out[f"{prefix}.lora_A"] = np.asarray(tree.lora_A)
            out[f"{prefix}.lora_B"] = np.asarray(tree.lora_B)
        return out
    if isinstance(tree, dict):
        for k, v in tree.items():
            collect_adapters(v, f"{prefix}.{k}" if prefix else k, out)
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            collect_adapters(v, f"{prefix}.{i}", out)
    return out


def save_quantized(
    save_dir: str | Path,
    params: dict,
    qcfg: QuantizeConfig,
    hf_config: dict,
    source_dir: str | Path | None = None,
    quant_log: list[dict] | None = None,
    max_shard_size: int = DEFAULT_MAX_SHARD,
):
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)

    from gptqmodel_tpu.models.definitions import get_model_def

    export_v1 = qcfg.format not in (FORMAT.GPTQ_V2, FORMAT.GPTQ_P, FORMAT.EXL3)
    conv1d = get_model_def(hf_config.get("model_type", "llama")).conv1d_suffixes
    flat = flatten_params(params, v1_zeros=export_v1, conv1d_suffixes=conv1d)
    _write_shards(save_dir, flat, max_shard_size)

    adapters = collect_adapters(params)
    if adapters:
        # HF-adapter-style sidecar (reference eora_processor saves lora_A/B
        # safetensors the same way)
        eora_dir = save_dir / "eora"
        eora_dir.mkdir(exist_ok=True)
        save_file(adapters, eora_dir / "adapter_model.safetensors")
        (eora_dir / "adapter_config.json").write_text(
            json.dumps({"adapter": qcfg.adapter or {"name": "eora"}})
        )

    qcfg_export = QuantizeConfig.from_dict(qcfg.to_dict())
    if export_v1:
        qcfg_export.format = FORMAT.GPTQ  # v1 is the on-disk interchange format
    qcfg_export.save_pretrained(save_dir)

    hf_config = dict(hf_config)
    hf_config["quantization_config"] = qcfg_export.to_dict()
    (save_dir / "config.json").write_text(json.dumps(hf_config, indent=2))

    if quant_log:
        with open(save_dir / "quant_log.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(quant_log[0].keys()))
            w.writeheader()
            w.writerows(quant_log)

    if source_dir is not None:
        src = Path(source_dir)
        for fname in _TOKENIZER_FILES:
            if (src / fname).exists():
                shutil.copy2(src / fname, save_dir / fname)


def _write_shards(save_dir: Path, flat: dict, max_shard_size: int):
    # safetensors save_file writes raw buffers: non-contiguous arrays would
    # be silently scrambled — force C order defensively
    flat = {k: np.ascontiguousarray(v) for k, v in flat.items()}
    sizes = {k: v.nbytes for k, v in flat.items()}
    total = sum(sizes.values())
    if total <= max_shard_size:
        save_file(flat, save_dir / "model.safetensors", metadata={"format": "pt"})
        return
    shards: list[dict] = [{}]
    acc = 0
    for name in flat:
        if acc + sizes[name] > max_shard_size and shards[-1]:
            shards.append({})
            acc = 0
        shards[-1][name] = flat[name]
        acc += sizes[name]
    n = len(shards)
    weight_map = {}
    for i, shard in enumerate(shards, 1):
        fname = f"model-{i:05d}-of-{n:05d}.safetensors"
        save_file(shard, save_dir / fname, metadata={"format": "pt"})
        for name in shard:
            weight_map[name] = fname
    index = {"metadata": {"total_size": total}, "weight_map": weight_map}
    (save_dir / "model.safetensors.index.json").write_text(json.dumps(index, indent=2))
