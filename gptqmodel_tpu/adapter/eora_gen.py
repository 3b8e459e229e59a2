"""Post-hoc EoRA adapter generation for an EXISTING quantized checkpoint.

TPU-native analog of ``GPTQModel.adapter.generate`` (reference
models/auto.py:758 -> base.py:1242 ``_eora_generate``): given a quantized
checkpoint and the original native checkpoint, compute rank-r eigenspace
adapters compensating ``delta = W_native - dequant(W_quant)`` against the
calibration activation covariance, and save them as the same sidecar format
the inline path writes (``eora/adapter_model.safetensors``).

Unlike the inline path (a free by-product of quantization), this runs its
own capture pass: one forward per layer over the QUANTIZED model, tapping
every packed module's input in a single pass (no subset structure needed —
the weights are fixed). The hidden stream advances through each layer AFTER
its adapters attach, so downstream covariance sees the corrected model —
matching the inline path's replay semantics (looper/quantize_loop.py
``replay_w = Wq + (A@B).T``).
"""

from __future__ import annotations

import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("gptqmodel_tpu")


def _quant_paths(tree, prefix="") -> list[str]:
    from gptqmodel_tpu.ops.qlinear import QuantLinear

    out = []
    if isinstance(tree, QuantLinear):
        return [prefix]
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.extend(_quant_paths(v, f"{prefix}.{k}" if prefix else k))
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            out.extend(_quant_paths(v, f"{prefix}.{i}"))
    return out


def generate_eora(
    native_model_dir,
    quantized_model_dir,
    calibration,
    rank: int,
    batch_size: int = 4,
    max_length: int = 2048,
    save_to=None,
):
    """Returns the quantized BaseQModel with lora_A/B attached; writes the
    sidecar to ``save_to`` (default: <quantized_model_dir>/eora)."""
    from safetensors.numpy import save_file

    from gptqmodel_tpu.looper.calibration import (
        CalibrationBatches,
        prepare_calibration,
    )
    from gptqmodel_tpu.models.auto import GPTQModel
    from gptqmodel_tpu.models.loader import CheckpointReader, build_params_tree
    from gptqmodel_tpu.models.definitions import get_model_def
    from gptqmodel_tpu.models.module_tree import parse_module_tree
    from gptqmodel_tpu.models.spec import load_hf_config
    from gptqmodel_tpu.models.transformer import (
        any_decoder_layer,
        embed,
        get_by_path,
        has_sliding_layers,
        layer_is_sliding,
        make_causal_mask,
        model_layers,
        rope_cos_sin,
    )
    from gptqmodel_tpu.ops.qlinear import dequantize_weight
    from gptqmodel_tpu.quantization.eora import compute_eora

    t0 = time.perf_counter()
    qm = GPTQModel.load(quantized_model_dir)
    assert qm.quantized, "quantized_model_dir must hold a quantized checkpoint"
    spec = qm.spec

    if not isinstance(calibration, CalibrationBatches):
        calibration = prepare_calibration(
            calibration, tokenizer=None, batch_size=batch_size,
            max_length=max_length,
        )
    ids_all, mask_all = calibration.input_ids, calibration.row_mask
    nb, B, T = ids_all.shape

    native_dir = Path(native_model_dir)
    n_reader = CheckpointReader(native_dir)
    mdef = get_model_def(spec.model_type, tensor_names=n_reader.names())
    n_reader = mdef.wrap_reader(n_reader, load_hf_config(native_dir))

    embed_fn = jax.jit(lambda base, ids: embed(spec, base, ids, jnp.float32))
    hidden = [
        np.asarray(embed_fn(qm.params, jnp.asarray(ids_all[b])))
        for b in range(nb)
    ]
    positions = jnp.broadcast_to(jnp.arange(T), (B, T))
    cos, sin = rope_cos_sin(spec, positions)
    bias = make_causal_mask(T, T)
    if has_sliding_layers(spec):
        cos_l, sin_l = rope_cos_sin(spec, positions, local=True)
        bias_l = make_causal_mask(T, T, window=spec.sliding_window)
    else:
        cos_l, sin_l, bias_l = cos, sin, bias

    step_cache: dict = {}

    def capture_fn(tap_reps: tuple[str, ...], sliding: bool):
        ck = (tap_reps, sliding)
        if ck in step_cache:
            return step_cache[ck]
        cs, sn, bs = (cos_l, sin_l, bias_l) if sliding else (cos, sin, bias)

        def step(lp, h, row_mask, Gs):
            taps: dict = {}
            any_decoder_layer(
                spec, lp, h, cs, sn, bs, taps=taps,
                tap_paths=frozenset(tap_reps),
            )
            flat_mask = row_mask.reshape(-1)
            newG = {}
            for key in tap_reps:
                t_ = taps[key]
                if isinstance(t_, tuple):  # MoE expert: (x, routing_mask)
                    x, routed = t_
                    m = routed.reshape(-1) * flat_mask
                else:
                    x, m = t_, flat_mask
                xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32) * m[:, None]
                newG[key] = Gs[key] + jnp.matmul(xf.T, xf, precision="highest")
            return newG

        fn = jax.jit(step)
        step_cache[ck] = fn
        return fn

    def replay(sliding: bool):
        ck = ("__replay__", sliding)
        if ck in step_cache:
            return step_cache[ck]
        cs, sn, bs = (cos_l, sin_l, bias_l) if sliding else (cos, sin, bias)
        fn = jax.jit(
            lambda lp, h: any_decoder_layer(spec, lp, h, cs, sn, bs)[0]
        )
        step_cache[ck] = fn
        return fn

    sidecar: dict[str, np.ndarray] = {}
    layers = list(model_layers(spec, qm.params))
    from gptqmodel_tpu.quantization.config import METHOD

    prefix = parse_module_tree(list(mdef.tree_for(METHOD.GPTQ))).layers_path
    for li, lp in enumerate(layers):
        paths = _quant_paths(lp)
        if not paths:
            continue
        sl = layer_is_sliding(spec, li)
        tap_reps = tuple(sorted(paths))
        in_feats = {p: get_by_path(lp, p).in_features for p in paths}
        Gs = {p: jnp.zeros((v, v), jnp.float32) for p, v in in_feats.items()}
        step = capture_fn(tap_reps, sl)
        for b in range(nb):
            Gs = step(
                lp, jnp.asarray(hidden[b]), jnp.asarray(mask_all[b]), Gs
            )
        jax.block_until_ready(list(Gs.values()))

        native_lp = build_params_tree(
            n_reader, layer_filter=li, conv1d_suffixes=mdef.conv1d_suffixes,
            layer_container=mdef.layers_container,
        )
        for p in paths:
            qmod = get_by_path(lp, p)
            W_nat = np.asarray(
                get_by_path(native_lp, p)["weight"], np.float32
            )
            Wq = np.asarray(dequantize_weight(qmod, jnp.float32)).T
            A, Bm = compute_eora(W_nat - Wq, Gs[p], rank)
            qmod.lora_A = jnp.asarray(A, jnp.float32)
            qmod.lora_B = jnp.asarray(Bm, jnp.float32)
            full = f"{prefix}.{li}.{p}"
            sidecar[f"{full}.lora_A"] = A.astype(np.float32)
            sidecar[f"{full}.lora_B"] = Bm.astype(np.float32)
        # advance with adapters attached: downstream layers capture the
        # corrected stream (inline-path replay semantics)
        rfn = replay(sl)
        for b in range(nb):
            hidden[b] = np.asarray(rfn(lp, jnp.asarray(hidden[b])))
        log.info("eora layer %d/%d: %d adapters", li + 1, len(layers),
                 len(paths))

    out_dir = Path(save_to) if save_to else Path(quantized_model_dir) / "eora"
    out_dir.mkdir(parents=True, exist_ok=True)
    save_file(sidecar, out_dir / "adapter_model.safetensors")
    import json

    (out_dir / "adapter_config.json").write_text(
        json.dumps({"rank": rank, "kind": "eora",
                    "generated_s": round(time.perf_counter() - t0, 2)})
    )
    log.info("eora sidecar saved to %s (%d tensors)", out_dir, len(sidecar))
    return qm
