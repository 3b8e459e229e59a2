"""Layer-by-layer GPTQ quantization loop — TPU-native orchestration.

Re-designs the reference looper stack (module_looper.py / stage_layer.py /
stage_subset.py / forward_executor.py, SURVEY §2.3/§3.2) functionally:

- No hooks: the functional forward returns the exact inputs of the modules
  being quantized (``tap_paths``); XLA dead-code-eliminates everything past
  the taps, which is what StopForward/masked-hook machinery achieved.
- No thread pool: per-batch Hessian accumulation is one jitted step reused
  across every layer (static shapes, compiled once per subset topology);
  data parallelism is a mesh axis over the batch dim (see parallel/), not
  worker threads.
- Shared-input batching: q/k/v (and gate/up) provably share their input in
  our forward, so they share ONE Hessian and ONE blocked solve over the
  concatenated output dim — the reference solves per-module with equal
  Hessians (gptq_processor.py:252).
- true_sequential: subsets are captured with all earlier subsets already
  quantized (weights replaced by their dequantized solve output), then the
  fully-quantized layer is replayed once to produce the next layer's inputs
  (reference stage_layer.py:161 replay semantics).
- Layer streaming: one decoder layer's weights are resident at a time
  (loader.layer_filter), the offload_to_disk / turtle equivalent.
- Failsafe: modules whose input group saw fewer than ``fallback_min_samples``
  real rows (dead MoE experts) fall back to RTN, recorded in the quant log
  (reference utils/fallback.py, stage_subset.py:948 coverage policy).
"""

from __future__ import annotations

import logging
import math
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gptqmodel_tpu.looper.calibration import CalibrationBatches
from gptqmodel_tpu.models.definitions import get_model_def, input_group_key
from gptqmodel_tpu.models.loader import CheckpointReader, build_params_tree
from gptqmodel_tpu.models.module_tree import parse_module_tree
from gptqmodel_tpu.models.spec import ModelSpec, load_hf_config, spec_from_hf_config
from gptqmodel_tpu.models.transformer import (
    any_decoder_layer,
    embed,
    final_norm,
    get_by_path,
    has_sliding_layers,
    layer_is_sliding,
    make_causal_mask,
    rope_cos_sin,
    set_by_path,
)
from gptqmodel_tpu.ops.qlinear import make_quant_linear
from gptqmodel_tpu.quantization.config import FORMAT, METHOD, QuantizeConfig
from gptqmodel_tpu.quantization.gptq import gptq_quantize
from gptqmodel_tpu.quantization.rtn import rtn_quantize


def _cfg_path(cfg: dict, key: str):
    """hf-config lookup supporting dotted nesting (dbrx ffn_config.*) and
    "|"-separated fallback paths (VL archs whose text config nests under
    text_config / llm_config / language_config depending on release)."""
    for cand in key.split("|"):
        cur = cfg
        for part in cand.split("."):
            if not isinstance(cur, dict):
                cur = None
                break
            cur = cur.get(part)
        if cur is not None:
            return cur
    return None

log = logging.getLogger("gptqmodel_tpu")


@dataclass
class QuantResult:
    params: dict
    quant_log: list[dict]
    spec: ModelSpec
    hf_config: dict
    source_dir: str | None = None
    durations: dict = field(default_factory=dict)


def quantize_model(
    model_dir: str | Path,
    qcfg: QuantizeConfig,
    calibration: CalibrationBatches,
    activation_dtype=jnp.float32,
) -> QuantResult:
    t_start = time.perf_counter()
    model_dir = Path(model_dir)
    hf_cfg = load_hf_config(model_dir)
    spec = spec_from_hf_config(hf_cfg)
    reader = CheckpointReader(model_dir)
    mdef = get_model_def(spec.model_type, tensor_names=reader.names())
    reader = mdef.wrap_reader(reader, hf_cfg)

    conv1d = mdef.conv1d_suffixes
    base = build_params_tree(reader, skip_layers=True, conv1d_suffixes=conv1d,
                             layer_container=mdef.layers_container)
    plan = parse_module_tree(list(mdef.tree_for(qcfg.method)))
    n_experts = (_cfg_path(hf_cfg, mdef.dynamic_expert_index)
                 if mdef.dynamic_expert_index else mdef.detected_num_experts)
    subsets = plan.build_subsets(n_experts)

    R = None
    if qcfg.rotation and qcfg.rotation.split("+")[0] in ("hadamard", "random"):
        from gptqmodel_tpu.quantization.rotation import (
            check_rotatable,
            rotate_base,
            rotation_matrix,
        )

        check_rotatable(spec)
        R = rotation_matrix(spec.hidden_size, qcfg.rotation.split("+")[0])
        rotate_base(spec, base, R)
        log.info("applied %s rotation to hidden stream", qcfg.rotation)

    ids_all = calibration.input_ids  # [nb, B, T]
    mask_all = calibration.row_mask
    nb, B, T = ids_all.shape

    # ---- stage: input capture (embeddings only; layers never run here) ----
    # base passed as an argument — closures would embed the embedding table
    # as HLO constants (GBs on real models; remote compilers reject them)
    embed_fn = jax.jit(
        lambda base, ids: embed(spec, base, ids, dtype=activation_dtype)
    )
    hidden = [np.asarray(embed_fn(base, jnp.asarray(ids_all[b]))) for b in range(nb)]
    if calibration.mm_embeds is not None:
        # multimodal calibration (modality != TEXT archs): replace
        # placeholder-token embeddings with the supplied vision/audio tower
        # outputs so every captured Hessian sees visual-context activations
        # (reference: per-arch prepare_dataset runs real image/audio batches,
        # gptqmodel/models/definitions/ovis.py:129, models/base.py:775,260)
        for b in range(nb):  # np.asarray(jax) is read-only -> copy to merge
            hidden[b] = calibration.merge_mm(np.array(hidden[b]), b)
    positions = jnp.broadcast_to(jnp.arange(T), (B, T))
    cos, sin = rope_cos_sin(spec, positions)
    attn_bias = make_causal_mask(T, T)
    # gemma3-style sliding layers: local rope + windowed mask variants
    if has_sliding_layers(spec):
        cos_l, sin_l = rope_cos_sin(spec, positions, local=True)
        bias_l = make_causal_mask(T, T, window=spec.sliding_window)
    else:
        cos_l, sin_l, bias_l = cos, sin, attn_bias

    def _rope_bias(sliding: bool):
        return (cos_l, sin_l, bias_l) if sliding else (cos, sin, attn_bias)

    # GPTAQ: a parallel NATIVE (never-quantized) activation stream feeds the
    # asymmetric-error cross term (replaces the reference's NativeProcessor
    # pre-pass, looper/native_processor.py). FOEM (reference foem.py) reuses
    # the same stream when its alpha enables the P-term; beta is a solver arg.
    foem_on = qcfg.foem is not None and qcfg.method == METHOD.GPTQ \
        and not qcfg.mock_quantization
    foem_beta = float((qcfg.foem or {}).get("beta", 0.2)) if foem_on else 0.0
    foem_alpha = float((qcfg.foem or {}).get("alpha", 0.0))
    gptaq_on = (
        qcfg.gptaq is not None and qcfg.method == METHOD.GPTQ
        and not qcfg.mock_quantization
    ) or (foem_on and foem_alpha > 0)
    gptaq_alpha = (
        foem_alpha if foem_on else float((qcfg.gptaq or {}).get("alpha", 0.25))
    )
    hidden_fp = [h.copy() for h in hidden] if gptaq_on else None

    # ---- jitted per-subset steps, compiled once, reused across layers -----
    step_cache: dict[Any, Any] = {}

    def hessian_step_fn(tap_reps: tuple[str, ...], sliding: bool = False):
        ck = (tap_reps, sliding)
        if ck in step_cache:
            return step_cache[ck]
        cos_s, sin_s, bias_s = _rope_bias(sliding)

        def step(lp, h, row_mask, Gs, ns, As):
            taps: dict = {}
            any_decoder_layer(
                spec, lp, h, cos_s, sin_s, bias_s,
                taps=taps, tap_paths=frozenset(tap_reps),
            )
            flat_mask = row_mask.reshape(-1)
            newG, newn, newA = {}, {}, {}
            for key in tap_reps:
                t_ = taps[key]
                if isinstance(t_, tuple):  # MoE expert: (x, routing_mask)
                    x, routed = t_
                    m = routed.reshape(-1) * flat_mask
                else:
                    x, m = t_, flat_mask
                xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32) * m[:, None]
                newG[key] = Gs[key] + jnp.matmul(xf.T, xf, precision="highest")
                newn[key] = ns[key] + jnp.sum(m)
                # channel |x| sums ride along (AWQ scale formula)
                newA[key] = As[key] + jnp.sum(jnp.abs(xf), axis=0)
            return newG, newn, newA

        fn = jax.jit(step)
        step_cache[ck] = fn
        return fn

    def gptaq_step_fn(tap_reps: tuple[str, ...], sliding: bool = False):
        """Like hessian_step_fn but also runs the NATIVE layer on the native
        stream and accumulates D = Σ (x̃ − x)ᵀ x per tap (MoE expert taps use
        the quantized stream's routing mask for both sides — token pairing
        across diverging routings is undefined)."""
        key = ("gptaq", sliding) + tap_reps
        if key in step_cache:
            return step_cache[key]
        cos_s, sin_s, bias_s = _rope_bias(sliding)

        def step(lp, h, lp_fp, h_fp, row_mask, Gs, ns, As, Ds):
            taps: dict = {}
            any_decoder_layer(
                spec, lp, h, cos_s, sin_s, bias_s,
                taps=taps, tap_paths=frozenset(tap_reps),
            )
            taps_fp: dict = {}
            any_decoder_layer(
                spec, lp_fp, h_fp, cos_s, sin_s, bias_s,
                taps=taps_fp, tap_paths=frozenset(tap_reps),
            )
            flat_mask = row_mask.reshape(-1)
            newG, newn, newA, newD = {}, {}, {}, {}
            for k_ in tap_reps:
                t_, tf_ = taps[k_], taps_fp[k_]
                if isinstance(t_, tuple):
                    x, routed = t_
                    xt = tf_[0]
                    m = routed.reshape(-1) * flat_mask
                else:
                    x, xt, m = t_, tf_, flat_mask
                xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32) * m[:, None]
                xtf = xt.reshape(-1, xt.shape[-1]).astype(jnp.float32) * m[:, None]
                newG[k_] = Gs[k_] + jnp.matmul(xf.T, xf, precision="highest")
                newn[k_] = ns[k_] + jnp.sum(m)
                newA[k_] = As[k_] + jnp.sum(jnp.abs(xf), axis=0)
                newD[k_] = Ds[k_] + jnp.matmul(
                    (xtf - xf).T, xf, precision="highest"
                )
            return newG, newn, newA, newD

        fn = jax.jit(step)
        step_cache[key] = fn
        return fn

    def replay_fn(sliding: bool = False):
        replay_key = ("__replay__", sliding)
        if replay_key in step_cache:
            return step_cache[replay_key]
        cos_s, sin_s, bias_s = _rope_bias(sliding)
        fn = jax.jit(
            lambda lp, h: any_decoder_layer(spec, lp, h, cos_s, sin_s, bias_s)[0]
        )
        step_cache[replay_key] = fn
        return fn

    # ---- the layer loop ----------------------------------------------------
    # streaming observability (reference gptq_processor.py:349-361 stat rows):
    # every quant_log.append logs one colored stat line and lands in the
    # stream CSV immediately — a multi-hour quant narrates itself
    from gptqmodel_tpu.utils.observe import QuantReporter, ReportingList

    reporter = QuantReporter(total_layers=spec.num_layers)
    quant_log: list[dict] = ReportingList(reporter)
    out_layers: list[dict] = []
    durations = {"forward": 0.0, "solve": 0.0, "pack": 0.0}

    # AWQ: inputs are captured from the fp layer for ALL modules at once and
    # scale folds apply to fp weights before any packing (autoawq semantics;
    # reference awq_processor collects per-layer input_feat the same way) —
    # so the subset structure merges into one capture pass.
    awq_mode = qcfg.method == METHOD.AWQ and not qcfg.mock_quantization
    subset_plan = (
        [[m for s in subsets for m in s]] if awq_mode else subsets
    )

    # mid-quant durability: persist each finished layer + replay state;
    # resume from the last complete layer after a crash (journal.py)
    from gptqmodel_tpu.looper.journal import QuantJournal

    journal = QuantJournal(
        qcfg.journal,
        {k: v for k, v in qcfg.to_dict().items() if k != "journal"},
        np.asarray(ids_all), np.asarray(mask_all), str(model_dir),
    )
    # finalize/pack overlap (reference drains pack+offload futures in a
    # background thread while the next layer forwards, stage_layer.py:714-940):
    # host packing and journal writes run in workers; futures resolve after
    # this layer's replay, so pack hides under the remaining solves + replay
    from concurrent.futures import ThreadPoolExecutor

    executor = (
        ThreadPoolExecutor(max_workers=qcfg.pack_workers)
        if qcfg.pack_workers > 0 else None
    )
    journal_future = None
    start_layer = 0
    resume = journal.resume_point()
    if resume is not None:
        start_layer, out_layers, rows, hidden, hidden_fp_r = resume
        if gptaq_on:
            if hidden_fp_r is None:
                log.warning("journal lacks native-stream state; restarting")
                start_layer, out_layers = 0, []
            else:
                hidden_fp = hidden_fp_r
        list.extend(quant_log, rows)  # restored rows: no re-narration

    for li in range(start_layer, spec.num_layers):
        _rows_before = len(quant_log)
        t_layer = time.perf_counter()
        lp = build_params_tree(reader, layer_filter=li, conv1d_suffixes=conv1d,
                               layer_container=mdef.layers_container)
        if R is not None:
            from gptqmodel_tpu.quantization.rotation import rotate_layer

            rotate_layer(spec, lp, R)
        lp = jax.tree.map(jnp.asarray, lp)
        lp_fp = jax.tree.map(lambda a: a, lp) if gptaq_on else None  # pristine copy
        sl = layer_is_sliding(spec, li)
        qlayer_mods: dict[str, Any] = {}

        for subset in subset_plan:
            groups = _build_groups(subset, li, qcfg, plan, lp)
            if not groups:
                continue
            tap_reps = tuple(sorted({g.tap for g in groups}))

            t0 = time.perf_counter()
            in_feats = {
                g.tap: int(get_by_path(lp, g.members[0])["weight"].shape[1])
                for g in groups
            }
            Gs = {k: jnp.zeros((v, v), jnp.float32) for k, v in in_feats.items()}
            ns = {k: jnp.zeros((), jnp.float32) for k in in_feats}
            As = {k: jnp.zeros((v,), jnp.float32) for k, v in in_feats.items()}
            Ds = None
            if gptaq_on:
                Ds = {k: jnp.zeros((v, v), jnp.float32) for k, v in in_feats.items()}
                step = gptaq_step_fn(tap_reps, sl)
                for b in range(nb):
                    Gs, ns, As, Ds = step(
                        lp, jnp.asarray(hidden[b]), lp_fp,
                        jnp.asarray(hidden_fp[b]), jnp.asarray(mask_all[b]),
                        Gs, ns, As, Ds,
                    )
            else:
                step = hessian_step_fn(tap_reps, sl)
                for b in range(nb):
                    Gs, ns, As = step(
                        lp, jnp.asarray(hidden[b]), jnp.asarray(mask_all[b]),
                        Gs, ns, As,
                    )
            jax.block_until_ready(list(Gs.values()))
            durations["forward"] += time.perf_counter() - t0

            if awq_mode:
                # phase B: scale search + fold on fp weights, all groups
                folds = {}
                for grp in groups:
                    folds[grp.tap] = _awq_search_and_fold(
                        grp, lp, Gs[grp.tap], As[grp.tap], float(ns[grp.tap]),
                        spec, durations,
                    )
                # phase C: clip + RTN quantize + pack, folded weights
                for grp in groups:
                    _awq_quantize_group(
                        grp, lp, Gs[grp.tap], folds[grp.tap],
                        float(ns[grp.tap]), li, qlayer_mods, quant_log,
                        durations,
                    )
            else:
                for grp in groups:
                    _quantize_group(
                        grp, lp, Gs[grp.tap], float(ns[grp.tap]), li, qcfg,
                        qlayer_mods, quant_log, durations,
                        dxxt=None if Ds is None else Ds[grp.tap],
                        gptaq_alpha=gptaq_alpha, foem_beta=foem_beta,
                        executor=executor,
                    )

        # replay with fully-quantized layer -> next layer inputs
        t0 = time.perf_counter()
        rfn = replay_fn(sl)
        for b in range(nb):
            hidden[b] = np.asarray(rfn(lp, jnp.asarray(hidden[b])))
        if gptaq_on:  # native stream replays through the pristine layer
            for b in range(nb):
                hidden_fp[b] = np.asarray(rfn(lp_fp, jnp.asarray(hidden_fp[b])))
        durations["forward"] += time.perf_counter() - t0

        # assemble output layer: QuantLinear leaves replace dense modules
        # (pack futures from the overlap executor resolve here — they had the
        # whole solve+replay window to finish)
        layer_out = jax.tree.map(np.asarray, lp)
        for path, qmod in qlayer_mods.items():
            if hasattr(qmod, "result"):
                qmod = qmod.result()
            set_by_path(layer_out, path, qmod)
        out_layers.append(layer_out)
        log.info(
            "layer %d/%d quantized in %.2fs",
            li + 1, spec.num_layers, time.perf_counter() - t_layer,
        )
        reporter.layer_done(li, durations)
        if journal.dir is not None:
            # hidden entries are REBOUND (not mutated) by replay, so shallow
            # list copies give the worker a consistent post-layer-li snapshot
            rows_li = list(quant_log[_rows_before:])
            h_snap = list(hidden)
            f_snap = list(hidden_fp) if gptaq_on else None
            # device_get on the MAIN thread: a worker-thread device fetch can
            # race the main thread's RPCs on single-connection device clients
            # (observed wedging the axon tunnel mid-run); the worker then only
            # pickles + writes
            layer_host = jax.device_get(layer_out)
            if executor is not None:
                if journal_future is not None:
                    journal_future.result()  # keep saves ordered, depth 1
                journal_future = executor.submit(
                    journal.save_layer, li, layer_host, rows_li, h_snap, f_snap
                )
            else:
                journal.save_layer(li, layer_host, rows_li, h_snap, f_snap)

    # ---- optional lm_head quantization -------------------------------------
    if qcfg.lm_head and not spec.tie_word_embeddings and "lm_head" in base:
        _quantize_lm_head(
            spec, base, hidden, mask_all, qcfg, quant_log, durations
        )

    from gptqmodel_tpu.models.transformer import set_model_layers

    params = dict(base)
    set_model_layers(spec, params, out_layers)

    if journal_future is not None:
        journal_future.result()
    if executor is not None:
        executor.shutdown(wait=True)
    durations["total"] = time.perf_counter() - t_start
    reporter.close()
    journal.finalize()
    return QuantResult(
        params=params,
        quant_log=quant_log,
        spec=spec,
        hf_config=hf_cfg,
        source_dir=str(model_dir),
        durations=durations,
    )


def weight_only_quantize(
    model_dir: str | Path,
    qcfg: QuantizeConfig,
) -> QuantResult:
    """Calibration-free path for RTN / FP8 (reference WeightOnlyLooper,
    looper/weight_only_looper.py:669): stream layers, quantize every tree
    module directly, no forwards at all."""
    from gptqmodel_tpu.ops.fp8 import (
        dequantize_fp4,
        dequantize_fp8,
        quantize_fp4,
        quantize_fp8,
    )

    t_start = time.perf_counter()
    model_dir = Path(model_dir)
    hf_cfg = load_hf_config(model_dir)
    spec = spec_from_hf_config(hf_cfg)
    reader = CheckpointReader(model_dir)
    mdef = get_model_def(spec.model_type, tensor_names=reader.names())
    reader = mdef.wrap_reader(reader, hf_cfg)
    conv1d = mdef.conv1d_suffixes
    base = build_params_tree(reader, skip_layers=True, conv1d_suffixes=conv1d,
                             layer_container=mdef.layers_container)
    plan = parse_module_tree(list(mdef.tree_for(qcfg.method)))
    n_experts = (_cfg_path(hf_cfg, mdef.dynamic_expert_index)
                 if mdef.dynamic_expert_index else mdef.detected_num_experts)
    modules = [m for s in plan.build_subsets(n_experts) for m in s]

    from gptqmodel_tpu.utils.observe import QuantReporter, ReportingList

    reporter = QuantReporter(total_layers=spec.num_layers)
    quant_log: list[dict] = ReportingList(reporter)
    out_layers: list[dict] = []
    for li in range(spec.num_layers):
        lp = build_params_tree(reader, layer_filter=li, conv1d_suffixes=conv1d,
                               layer_container=mdef.layers_container)
        for m in modules:
            full = f"{plan.layers_path}.{li}.{m}"
            mcfg = qcfg.for_module(full)
            if mcfg is None:
                continue
            t0 = time.perf_counter()
            dense = get_by_path(lp, m)
            W = np.asarray(dense["weight"], np.float32)
            bias = dense.get("bias")
            if mcfg.method == METHOD.FP8:
                qmod = quantize_fp8(W)
                qmod.bias = None if bias is None else np.asarray(bias)
                loss = float(np.mean((np.asarray(dequantize_fp8(qmod)) - W) ** 2))
            elif mcfg.method == METHOD.FP4:
                qmod = quantize_fp4(W, group_size=mcfg.group_size)
                qmod.bias = None if bias is None else np.asarray(bias)
                loss = float(
                    np.mean((np.asarray(dequantize_fp4(qmod)).T - W) ** 2)
                )
            elif mcfg.method == METHOD.BITSANDBYTES:
                from gptqmodel_tpu.ops.bnb import dequantize_bnb4, nf4_quantize

                bs = mcfg.group_size if mcfg.group_size > 0 else 64
                qmod = nf4_quantize(
                    W, blocksize=bs,
                    bias=None if bias is None else np.asarray(bias),
                )
                loss = float(np.mean((np.asarray(dequantize_bnb4(qmod)) - W) ** 2))
            else:  # RTN
                res = rtn_quantize(
                    W, bits=mcfg.bits, group_size=mcfg.group_size,
                    sym=mcfg.sym, mse=mcfg.mse > 0,
                )
                qmod = make_quant_linear(
                    Q=res.Q, scales=res.scales, zeros=res.zeros, g_idx=None,
                    bias=None if bias is None else np.asarray(bias),
                    bits=mcfg.bits, group_size=mcfg.group_size, sym=mcfg.sym,
                )
                loss = res.avg_loss
            set_by_path(lp, m, qmod)
            quant_log.append({
                "layer": li, "module": m, "loss": round(loss, 8), "samples": 0,
                "damp": 0.0, "bits": mcfg.bits, "group_size": mcfg.group_size,
                "fallback": False,
                "time_s": round(time.perf_counter() - t0, 4),
            })
        out_layers.append(lp)
        log.info("layer %d/%d weight-only quantized", li + 1, spec.num_layers)

    from gptqmodel_tpu.models.transformer import set_model_layers as _sml

    params = dict(base)
    _sml(spec, params, out_layers)
    return QuantResult(
        params=params, quant_log=quant_log, spec=spec, hf_config=hf_cfg,
        source_dir=str(model_dir),
        durations={"total": time.perf_counter() - t_start},
    )


# --------------------------------------------------------------------------
# internals
# --------------------------------------------------------------------------


@dataclass
class _Group:
    tap: str  # representative tap path (module whose input is recorded)
    members: list[str]  # module paths sharing that input
    cfgs: list[QuantizeConfig]  # per-member effective configs


def _build_groups(
    subset: list[str], layer_idx: int, qcfg: QuantizeConfig, plan, lp=None
) -> list[_Group]:
    """Group subset modules by provably-shared input; resolve dynamic cfg.
    Paths absent from the layer params are skipped (optional-module semantics:
    deepseek dense-vs-moe layers, lite-vs-full q_proj variants — reference
    layer_modules_strict=False)."""
    by_key: dict[str, _Group] = {}
    for path in subset:
        if lp is not None:
            try:
                get_by_path(lp, path)
            except (KeyError, IndexError, TypeError):
                continue  # module absent in this layer (optional)
        full = f"{plan.layers_path}.{layer_idx}.{path}"
        mcfg = qcfg.for_module(full)
        if mcfg is None:  # '-:' dynamic exclusion
            continue
        key = input_group_key(path)
        grp = by_key.get(key)
        if grp is None:
            grp = _Group(tap=path, members=[], cfgs=[])
            by_key[key] = grp
        grp.tap = min(grp.tap, path)
        grp.members.append(path)
        grp.cfgs.append(mcfg)
    return list(by_key.values())


def _quantize_group(
    grp: _Group,
    lp: dict,
    G: jnp.ndarray,
    n_rows: float,
    layer_idx: int,
    qcfg: QuantizeConfig,
    qlayer_mods: dict,
    quant_log: list,
    durations: dict,
    dxxt=None,
    gptaq_alpha: float = 0.25,
    foem_beta: float = 0.0,
    executor=None,
):
    """Solve all members of an input group (batched when configs match).

    With ``executor``, the host pack of each member is submitted as a future
    stored in ``qlayer_mods`` (resolved by the caller after replay) so packing
    overlaps the remaining solves + replay (reference stage_layer.py:714-940
    finalize-future drain)."""
    same_cfg = all(c == grp.cfgs[0] for c in grp.cfgs[1:])
    H = (2.0 / max(n_rows, 1.0)) * G
    if dxxt is not None:
        dxxt = (2.0 / max(n_rows, 1.0)) * dxxt

    if qcfg.method == METHOD.EXL3:
        _quantize_group_exl3(
            grp, lp, H, n_rows, layer_idx, qcfg, qlayer_mods, quant_log,
            durations,
        )
        return

    if same_cfg and len(grp.members) > 1:
        batches = [(grp.members, grp.cfgs[0])]
    else:
        batches = [([m], c) for m, c in zip(grp.members, grp.cfgs)]

    # online Hadamard (QuaRot set_had_K analog): the outlier-heavy inputs of
    # the second-linear modules are rotated at runtime; quantize in the
    # transformed space (W~ = W·T, H~ = T·H·T with T = I ⊗ H_b symmetric
    # involution)
    _ONLINE_LEAVES = {"down_proj", "w2", "fc2", "dense_4h_to_h", "c_proj"}
    leaf = grp.members[0].rsplit(".", 1)[-1]
    had_b = 0
    if qcfg.rotation and "online" in qcfg.rotation and leaf in _ONLINE_LEAVES:
        from gptqmodel_tpu.ops.hadamard import fht_np, largest_pow2_divisor

        in_f_grp = int(H.shape[0])
        had_b = largest_pow2_divisor(in_f_grp)
        if had_b >= 2:
            Hn = np.asarray(H, np.float64)
            H = jnp.asarray(fht_np(fht_np(Hn, had_b).T, had_b).T.astype(np.float32))
            if dxxt is not None:
                Dn = np.asarray(dxxt, np.float64)
                dxxt = jnp.asarray(
                    fht_np(fht_np(Dn, had_b).T, had_b).T.astype(np.float32)
                )
        else:
            had_b = 0

    for members, cfg in batches:
        t0 = time.perf_counter()
        # weights stay DEVICE-resident through the solve: a host fetch +
        # re-upload of W_cat costs ~1 GB of PCIe round trips per gate|up
        # group at 8B shapes (the dominant per-module wall over slow links,
        # session V2/V3); numpy-only branches below materialize explicitly
        Ws = [
            jnp.asarray(get_by_path(lp, m)["weight"], dtype=jnp.float32)
            for m in members
        ]
        out_sizes = [int(w.shape[0]) for w in Ws]
        W_cat = jnp.concatenate(Ws, axis=0) if len(Ws) > 1 else Ws[0]
        if had_b:
            from gptqmodel_tpu.ops.hadamard import fht_np

            W_cat = fht_np(
                np.asarray(W_cat, np.float32).astype(np.float64), had_b
            ).astype(np.float32)

        # model-wide pre-quant Smoother preprocessor (reference SmootherConfig
        # config.py:1127 + module_preprocessor.py plan; numerics
        # fallback_smooth.py::smooth_block). Applied in solve space (after the
        # optional Hadamard) so a rowcol scale folds consistently into the
        # solver's per-group scales below.
        pre_scale = None
        if qcfg.smooth is not None and not cfg.mock_quantization:
            from gptqmodel_tpu.quantization.smooth import smooth_weight

            _mse_kw = (
                {"bits": cfg.bits, "sym": cfg.sym}
                if (qcfg.smooth == "mse"
                    or (isinstance(qcfg.smooth, dict)
                        and qcfg.smooth.get("type") == "mse"))
                else {}
            )
            W_sm, pre_scale = smooth_weight(
                np.asarray(W_cat, np.float32), qcfg.smooth, cfg.group_size,
                group_threshold=qcfg.smooth_group_threshold, **_mse_kw,
            )
            if pre_scale is not None and cfg.method == METHOD.PAROQUANT:
                log.warning("smooth rowcol incompatible with paroquant; skipped")
                pre_scale = None
            else:
                W_cat = W_sm

        fallback = n_rows < max(qcfg.fallback_min_samples, 1)
        paro_attach = None
        if cfg.mock_quantization or cfg.method == METHOD.RTN or fallback:
            row_scale = None
            if fallback and qcfg.fallback_smooth:
                from gptqmodel_tpu.quantization.smooth import smooth_weight

                W_cat, row_scale = smooth_weight(
                    W_cat, qcfg.fallback_smooth, cfg.group_size
                )
            res = rtn_quantize(
                W_cat, bits=cfg.bits, group_size=cfg.group_size,
                sym=cfg.sym, mse=cfg.mse > 0,
            )
            if row_scale is not None:  # fold rowcol factor back
                # row_scale [n_groups, out] aligns with res.scales
                res.scales = res.scales * row_scale
                g_eff = W_cat.shape[1] // row_scale.shape[0]
                res.Wq = res.Wq * np.repeat(row_scale.T, g_eff, axis=1)
        elif cfg.method == METHOD.PAROQUANT:
            # learned pairwise-rotation quantization (quantization/paroquant)
            from gptqmodel_tpu.quantization.gptq import GPTQResult
            from gptqmodel_tpu.quantization.paroquant import (
                apply_paro,
                paroquant_optimize,
            )

            pq = qcfg.paroquant or {}
            pres = paroquant_optimize(
                np.asarray(W_cat, np.float32), np.asarray(H),
                bits=cfg.bits, group_size=cfg.group_size,
                rot_group=int(pq.get("rot_group", 128)),
                rounds=int(pq.get("rounds", 4)),
                steps=int(pq.get("steps", 64)),
                lr=float(pq.get("lr", 5e-3)),
                scale_lr=float(pq.get("scale_lr", 1e-3)),
                nsamples=int(n_rows),
            )
            rg = min(int(pq.get("rot_group", 128)), W_cat.shape[1])
            while W_cat.shape[1] % rg:
                rg //= 2
            # replay weights back in the ORIGINAL input space
            w_orig = np.asarray(
                apply_paro(
                    jnp.asarray(pres.Wq_t), jnp.asarray(pres.theta), None,
                    rg, inverse=True,
                )
            ) * pres.chan_scales[None, :]
            res = GPTQResult(
                Q=pres.Q, Wq=w_orig, scales=pres.scales, zeros=pres.zeros,
                g_idx=np.arange(W_cat.shape[1], dtype=np.int32)
                // (cfg.group_size if cfg.group_size > 0 else W_cat.shape[1]),
                perm=None, avg_loss=pres.avg_loss, damp=0.0,
                nsamples=int(n_rows),
            )
            paro_attach = (pres, rg)
        else:
            # TP padder (reference TensorParallelPadderConfig + gptq.py:208):
            # zero-pad in-features to lcm(8, group_size) so the solve's group
            # layout is TP-shard aligned; truncate the solution afterwards
            pad_cols = 0
            if cfg.tp_pad:
                mult = math.lcm(8, cfg.group_size) if cfg.group_size > 0 else 8
                pad_cols = (-W_cat.shape[1]) % mult
            W_solve, H_solve, dxxt_solve = W_cat, H, dxxt
            if pad_cols:
                W_solve = jnp.pad(jnp.asarray(W_cat), ((0, 0), (0, pad_cols)))
                H_solve = jnp.pad(H, ((0, pad_cols), (0, pad_cols)))
                if dxxt is not None:
                    dxxt_solve = jnp.pad(dxxt, ((0, pad_cols), (0, pad_cols)))
            res = gptq_quantize(
                W_solve, H_solve,
                bits=cfg.bits, group_size=cfg.group_size, sym=cfg.sym,
                desc_act=cfg.desc_act, act_group_aware=cfg.act_group_aware,
                mse=cfg.mse > 0, damp_percent=cfg.damp_percent,
                damp_auto_increment=cfg.damp_auto_increment,
                nsamples=int(n_rows),
                dxxt=dxxt_solve, gptaq_alpha=gptaq_alpha, foem_beta=foem_beta,
                static_groups=cfg.static_groups,
            )
            if pad_cols:  # drop the synthetic columns (gptq.py:1318-1321)
                valid = W_cat.shape[1]
                res.Q = res.Q[:, :valid]
                res.Wq = res.Wq[:, :valid]
                res.g_idx = res.g_idx[:valid]
                if res.Wq_dev is not None:
                    res.Wq_dev = res.Wq_dev[:, :valid]
        if not np.isfinite(res.avg_loss):
            # NaN-loss recovery (reference gptq.py:1268: retry with mock /
            # raise): fall back to RTN on the ORIGINAL weights, recorded as
            # a fallback row
            log.warning(
                "NaN loss for %s — falling back to RTN", ",".join(members)
            )
            Ws0 = [
                np.asarray(get_by_path(lp, m)["weight"], np.float32)
                for m in members
            ]
            res = rtn_quantize(
                np.concatenate(Ws0, axis=0) if len(Ws0) > 1 else Ws0[0],
                bits=cfg.bits, group_size=cfg.group_size, sym=cfg.sym,
            )
            paro_attach = None
            had_b = 0
            fallback = True
            pre_scale = None  # recovery re-quantized RAW weights
        if pre_scale is not None:  # fold the Smoother rowcol factor back
            g_eff = W_cat.shape[1] // pre_scale.shape[0]
            res.Wq = res.Wq * np.repeat(pre_scale.T, g_eff, axis=1)
            if res.Wq_dev is not None:  # same fold on the device replica
                res.Wq_dev = res.Wq_dev * jnp.repeat(
                    jnp.asarray(pre_scale.T), g_eff, axis=1
                )
            if pre_scale.shape[0] != res.scales.shape[0]:  # tp_pad tail groups
                pre_scale = np.vstack([
                    pre_scale,
                    np.ones((res.scales.shape[0] - pre_scale.shape[0],
                             pre_scale.shape[1]), np.float32),
                ])
            res.scales = res.scales * pre_scale
        solve_t = time.perf_counter() - t0
        durations["solve"] += solve_t

        t0 = time.perf_counter()
        eora_rank = 0
        if qcfg.adapter and qcfg.adapter.get("name", "eora") == "eora":
            eora_rank = int(qcfg.adapter.get("rank", 64))
        if cfg.method == METHOD.PAROQUANT:
            eora_rank = 0  # adapters live in input space; paro transforms it
        row0 = 0
        for m, out_f in zip(members, out_sizes):
            sl = slice(row0, row0 + out_f)
            row0 += out_f
            dense = get_by_path(lp, m)
            bias = dense.get("bias")

            def build_qmod(
                sl=sl, bias=None if bias is None else np.asarray(bias),
                cfg=cfg, lora=None,
            ):
                qmod = make_quant_linear(
                    Q=res.Q[sl], scales=res.scales[:, sl],
                    zeros=res.zeros[:, sl], g_idx=res.g_idx, bias=bias,
                    bits=cfg.bits, group_size=cfg.group_size, sym=cfg.sym,
                    planar=cfg.format == FORMAT.GPTQ_P,
                    a8=cfg.method == METHOD.QQQ,
                    had_block=had_b,
                )
                if paro_attach is not None:
                    pres_, rg_ = paro_attach
                    qmod.rot_theta = jnp.asarray(pres_.theta)
                    qmod.rot_scales = jnp.asarray(pres_.chan_scales)
                    qmod.rot_group = rg_
                if lora is not None:
                    qmod.lora_A = jnp.asarray(lora[0], dtype=jnp.float32)
                    qmod.lora_B = jnp.asarray(lora[1], dtype=jnp.float32)
                return qmod

            lora_ab = None
            replay_w = res.Wq[sl]
            # device replica of the replay weight: skips the [out, in] f32
            # host->device upload per module when no host-space transform
            # (hadamard) intervenes
            replay_dev = None if res.Wq_dev is None else res.Wq_dev[sl]
            if eora_rank > 0:
                # EoRA from the same Hessian statistic (see quantization/eora.py)
                # (with online had, all quantities live in the transformed
                # space — A/B apply to fht(x), matching the runtime)
                from gptqmodel_tpu.quantization.eora import compute_eora

                # delta stays on device when the replay weight is resident —
                # only the rank-r A/B factors cross the PCIe tunnel (the
                # host round-trip of W_cat[sl] undid the transfer-lean fetch)
                if res.Wq_dev is not None:
                    delta = W_cat[sl] - res.Wq_dev[sl]
                else:
                    delta = np.asarray(W_cat[sl]) - res.Wq[sl]
                A, B = compute_eora(delta, H * (max(n_rows, 1.0) / 2.0), eora_rank)
                lora_ab = (A, B)  # device compute stays inline; pack defers
                # replay matches inference: quantized weight + low-rank term
                replay_w = res.Wq[sl] + (A @ B).T
                if replay_dev is not None:
                    replay_dev = replay_dev + jnp.asarray(
                        (A @ B).T, jnp.float32
                    )
            if had_b:  # replay in the ORIGINAL space (T is an involution)
                from gptqmodel_tpu.ops.hadamard import fht_np

                replay_w = fht_np(
                    replay_w.astype(np.float64), had_b
                ).astype(np.float32)
                replay_dev = None  # host-space transform; upload below
            qlayer_mods[m] = (
                executor.submit(build_qmod, lora=lora_ab)
                if executor is not None
                else build_qmod(lora=lora_ab)
            )
            # true_sequential: subsequent subsets/replay see quantized weights
            dense["weight"] = (
                replay_dev.astype(dense["weight"].dtype)
                if replay_dev is not None
                else jnp.asarray(replay_w, dtype=dense["weight"].dtype)
            )
            quant_log.append({
                "layer": layer_idx,
                "module": m,
                "loss": round(res.avg_loss, 8),
                "samples": int(n_rows),
                "damp": res.damp,
                "bits": cfg.bits,
                "group_size": cfg.group_size,
                "fallback": bool(
                    fallback or cfg.mock_quantization or cfg.method == METHOD.RTN
                ),
                "time_s": round(solve_t / len(members), 4),
            })
        durations["pack"] += time.perf_counter() - t0


def _quantize_group_exl3(
    grp: _Group,
    lp: dict,
    H: jnp.ndarray,
    n_rows: float,
    layer_idx: int,
    qcfg: QuantizeConfig,
    qlayer_mods: dict,
    quant_log: list,
    durations: dict,
):
    """EXL3 trellis path: the prepared (sign-flipped, Hadamard-transformed,
    block-LDL-factored) Hessian is shared across the whole shared-input group,
    mirroring reference finalize_capture_H reuse (exl3_lib/quantize.py:561);
    each member is trellis-quantized with LDLQ feedback and packed into a
    TrellisLinear."""
    from gptqmodel_tpu.ops.trellis import make_trellis_linear
    from gptqmodel_tpu.quantization.exl3 import prepare_exl3_hessian, quantize_exl3

    H_np = np.asarray(H, np.float32)
    if n_rows < max(qcfg.fallback_min_samples, 1) or qcfg.mock_quantization:
        # uncalibrated module (dead MoE expert etc.): reference q_fallback —
        # trellis-quantize without LDL compensation. mock_quantization also
        # takes this path (no Cholesky/LDL — fast lifecycle tests).
        H_np = np.zeros_like(H_np)
    seed = abs(hash((layer_idx, grp.tap))) % (2**31)
    H_data = prepare_exl3_hessian(H_np, seed=seed)

    for m, cfg in zip(grp.members, grp.cfgs):
        t0 = time.perf_counter()
        dense = get_by_path(lp, m)
        W = np.asarray(dense["weight"], np.float32)  # [out, in]
        res = quantize_exl3(
            W.T,
            H_data,
            K=int(cfg.bits),
            cb=cfg.codebook,
            out_scales=cfg.out_scales,
            seed=seed,
            skip_g_scale=bool(cfg.mock_quantization),
        )
        solve_t = time.perf_counter() - t0
        durations["solve"] += solve_t

        bias = dense.get("bias")
        qmod = make_trellis_linear(
            trellis=res.trellis,
            suh=res.suh,
            svh=res.svh,
            bias=None if bias is None else np.asarray(bias),
            K=int(cfg.bits),
            cb=cfg.codebook,
        )
        replay_w = res.Wq.T  # back to [out, in]
        if qcfg.adapter and qcfg.adapter.get("name", "eora") == "eora":
            from gptqmodel_tpu.quantization.eora import compute_eora

            rank = int(qcfg.adapter.get("rank", 64))
            delta = W - replay_w
            A, B = compute_eora(delta, H_np * (max(n_rows, 1.0) / 2.0), rank)
            qmod.lora_A = jnp.asarray(A, dtype=jnp.float32)
            qmod.lora_B = jnp.asarray(B, dtype=jnp.float32)
            replay_w = replay_w + (A @ B).T
        qlayer_mods[m] = qmod
        dense["weight"] = jnp.asarray(replay_w, dtype=dense["weight"].dtype)
        quant_log.append({
            "layer": layer_idx,
            "module": m,
            "loss": round(float(res.proxy_err), 8),
            "samples": int(n_rows),
            "damp": 0.0,
            "bits": int(cfg.bits),
            "group_size": -1,
            "fallback": bool(H_data["q_fallback"]),
            "time_s": round(solve_t, 4),
        })


def _awq_fold_target(grp: _Group, lp: dict, spec) -> tuple[str, str] | None:
    """(kind, path) the group's channel scales fold into, or None.

    Standard AWQ fold map (llama lineage): qkv <- input_layernorm,
    gate/up <- post_attention_layernorm (pre_feedforward for gemma2-style),
    o_proj <- v_proj rows (only without GQA), down_proj <- up_proj rows.
    MoE expert gate/up share their input with every other expert, so no
    per-expert fold exists — clip-only (s=1)."""
    tap = grp.tap
    parent, _, leaf = tap.rpartition(".")
    if leaf in ("q_proj", "k_proj", "v_proj"):
        return ("norm", "input_layernorm")
    if leaf in ("gate_proj", "up_proj", "w1", "w3"):
        if "experts" in parent:
            return None
        if spec.post_norms:
            return ("norm", "pre_feedforward_layernorm")
        return ("norm", "post_attention_layernorm")
    if leaf == "o_proj":
        if spec.num_heads != spec.num_kv_heads:
            return None  # GQA: o input channels repeat v channels
        return ("linear", f"{parent}.v_proj")
    if leaf in ("down_proj", "w2"):
        up = "up_proj" if leaf == "down_proj" else "w3"
        return ("linear", f"{parent}.{up}")
    return None


def _awq_search_and_fold(
    grp: _Group,
    lp: dict,
    G: jnp.ndarray,
    A: jnp.ndarray,
    n_rows: float,
    spec,
    durations: dict,
) -> jnp.ndarray:
    """Phase B: search the group's channel scale, apply the fold to the fp
    weights of the producing norm/linear. Returns s [in]."""
    from gptqmodel_tpu.looper.awq import (
        fold_scale_into_linear_rows,
        fold_scale_into_norm,
        search_scale,
    )

    cfg = grp.cfgs[0]
    in_f = int(get_by_path(lp, grp.members[0])["weight"].shape[1])
    fold = _awq_fold_target(grp, lp, spec)
    if fold is None or n_rows < 1:
        return jnp.ones((in_f,), jnp.float32)

    t0 = time.perf_counter()
    Ws = [np.asarray(get_by_path(lp, m)["weight"], np.float32) for m in grp.members]
    W_cat = jnp.asarray(np.concatenate(Ws, axis=0) if len(Ws) > 1 else Ws[0])
    xmean = A / jnp.maximum(n_rows, 1.0)
    s, _ = search_scale(
        W_cat, G, xmean, bits=cfg.bits, group_size=cfg.group_size, sym=cfg.sym
    )
    s = jnp.where(jnp.isfinite(s), s, 1.0)

    kind, path = fold
    target = get_by_path(lp, path)
    if kind == "norm":
        target["weight"] = fold_scale_into_norm(target["weight"], s)
    else:
        w2, b2 = fold_scale_into_linear_rows(target["weight"], target.get("bias"), s)
        target["weight"] = w2
        if b2 is not None:
            target["bias"] = b2
    durations["solve"] += time.perf_counter() - t0
    return s


def _awq_quantize_group(
    grp: _Group,
    lp: dict,
    G: jnp.ndarray,
    s: jnp.ndarray,
    n_rows: float,
    layer_idx: int,
    qlayer_mods: dict,
    quant_log: list,
    durations: dict,
):
    """Phase C: clip search + RTN quantize the (folded) scaled weights."""
    from gptqmodel_tpu.looper.awq import scaled_hessian, search_clip

    cfg = grp.cfgs[0]
    t0 = time.perf_counter()
    Ws = [np.asarray(get_by_path(lp, m)["weight"], np.float32) for m in grp.members]
    out_sizes = [w.shape[0] for w in Ws]
    W_cat = jnp.asarray(np.concatenate(Ws, axis=0) if len(Ws) > 1 else Ws[0])

    Wsc = W_cat * s[None, :]
    G_sc = scaled_hessian(G, s)
    W_clip = search_clip(
        Wsc, G_sc, bits=cfg.bits, group_size=cfg.group_size, sym=cfg.sym
    )
    res = rtn_quantize(
        np.asarray(W_clip), bits=cfg.bits, group_size=cfg.group_size,
        sym=cfg.sym, mse=cfg.mse > 0,
    )
    delta = jnp.asarray(res.Wq) - Wsc
    final_loss = float(
        jnp.einsum("oi,ij,oj->", delta, G_sc, delta, precision="highest")
    ) / max(n_rows, 1.0)
    solve_t = time.perf_counter() - t0
    durations["solve"] += solve_t

    t0 = time.perf_counter()
    row0 = 0
    for m, out_f in zip(grp.members, out_sizes):
        sl = slice(row0, row0 + out_f)
        row0 += out_f
        dense = get_by_path(lp, m)
        bias = dense.get("bias")
        qmod = make_quant_linear(
            Q=res.Q[sl], scales=res.scales[:, sl], zeros=res.zeros[:, sl],
            g_idx=None, bias=None if bias is None else np.asarray(bias),
            bits=cfg.bits, group_size=cfg.group_size, sym=cfg.sym,
        )
        qlayer_mods[m] = qmod
        # replay path: dense weight = dequantized scaled weight; the input
        # arriving from the folded producer is already divided by s
        dense["weight"] = jnp.asarray(res.Wq[sl], dtype=jnp.float32)
        quant_log.append({
            "layer": layer_idx,
            "module": m,
            "loss": round(final_loss, 8),
            "samples": int(n_rows),
            "damp": 0.0,
            "bits": cfg.bits,
            "group_size": cfg.group_size,
            "fallback": False,
            "time_s": round(solve_t / len(grp.members), 4),
        })
    durations["pack"] += time.perf_counter() - t0


def _quantize_lm_head(spec, base, hidden, mask_all, qcfg, quant_log, durations):
    head = base["lm_head"]
    in_f = head["weight"].shape[1]

    norm_params = {"model": {k: v for k, v in base["model"].items() if k != "layers"}}         if "model" in base else base

    @jax.jit
    def head_G_step(norm_params, h, row_mask, G, n):
        x = final_norm(spec, norm_params, h)
        xf = x.reshape(-1, in_f).astype(jnp.float32) * row_mask.reshape(-1)[:, None]
        return G + jnp.matmul(xf.T, xf, precision="highest"), n + jnp.sum(row_mask)

    G = jnp.zeros((in_f, in_f), jnp.float32)
    n = jnp.zeros((), jnp.float32)
    for b in range(len(hidden)):
        G, n = head_G_step(
            norm_params, jnp.asarray(hidden[b]), jnp.asarray(mask_all[b]), G, n
        )
    n_rows = float(n)
    mcfg = qcfg.for_module("lm_head") or qcfg

    t0 = time.perf_counter()
    W = np.asarray(head["weight"], dtype=np.float32)

    if qcfg.method == METHOD.EXL3:
        from gptqmodel_tpu.ops.trellis import make_trellis_linear
        from gptqmodel_tpu.quantization.exl3 import (
            prepare_exl3_hessian,
            quantize_exl3,
        )

        vocab, hid = W.shape
        if vocab % 128 or hid % 128:
            log.warning(
                "lm_head shape (%d, %d) not 128-aligned — kept dense", vocab, hid
            )
            return
        head_k = int(mcfg.head_bits if mcfg.head_bits is not None
                     else max(int(mcfg.bits), 6))  # exllamav3 head default: >=6bpw
        H_np = np.asarray(G, np.float32) / max(n_rows, 1.0) * 2.0
        if qcfg.mock_quantization:
            H_np = np.zeros_like(H_np)
        H_data = prepare_exl3_hessian(H_np, seed=12345)
        res = quantize_exl3(
            W.T, H_data, K=head_k, cb=mcfg.codebook,
            out_scales=mcfg.out_scales, seed=12345,
            skip_g_scale=bool(qcfg.mock_quantization),
        )
        durations["solve"] += time.perf_counter() - t0
        bias = head.get("bias")
        base["lm_head"] = make_trellis_linear(
            trellis=res.trellis, suh=res.suh, svh=res.svh,
            bias=None if bias is None else np.asarray(bias),
            K=head_k, cb=mcfg.codebook,
        )
        quant_log.append({
            "layer": -1, "module": "lm_head",
            "loss": round(float(res.proxy_err), 8), "samples": int(n_rows),
            "damp": 0.0, "bits": head_k, "group_size": -1,
            "fallback": bool(H_data["q_fallback"]), "time_s": 0.0,
        })
        return

    res = gptq_quantize(
        W, (2.0 / max(n_rows, 1.0)) * G,
        bits=mcfg.bits, group_size=mcfg.group_size, sym=mcfg.sym,
        desc_act=mcfg.desc_act, act_group_aware=mcfg.act_group_aware,
        mse=mcfg.mse > 0, damp_percent=mcfg.damp_percent,
        damp_auto_increment=mcfg.damp_auto_increment, nsamples=int(n_rows),
    )
    durations["solve"] += time.perf_counter() - t0
    bias = head.get("bias")
    base["lm_head"] = make_quant_linear(
        Q=res.Q, scales=res.scales, zeros=res.zeros, g_idx=res.g_idx,
        bias=None if bias is None else np.asarray(bias),
        bits=mcfg.bits, group_size=mcfg.group_size, sym=mcfg.sym,
    )
    quant_log.append({
        "layer": -1, "module": "lm_head", "loss": round(res.avg_loss, 8),
        "samples": int(n_rows), "damp": res.damp, "bits": mcfg.bits,
        "group_size": mcfg.group_size, "fallback": False, "time_s": 0.0,
    })
