"""Inference-time graph optimizations on the params pytree.

Analog of the reference's ``model.optimize()`` (gptqmodel/models/base.py:1760,
lookahead/fusion config at base.py:1743): transforms that change how compute
is issued without changing results.

``fuse_projections`` merges q/k/v -> qkv_proj and gate/up -> gate_up_proj
when they are QuantLinears with identical quant configs: one wide fused
dequant-matmul call replaces three/two narrower ones — fewer kernel launches
and wider N tiles (the decode kernel's efficiency grows with N). The
functional forward already consumes the fused names (phi3 path), and
splitting the output is free (it's a reshape of lanes).
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from gptqmodel_tpu.models.spec import ModelSpec
from gptqmodel_tpu.ops.qlinear import QuantLinear

log = logging.getLogger("gptqmodel_tpu")


def _same_perm(m: QuantLinear, a: QuantLinear) -> bool:
    """Members must share the column order: both contiguous, or identical
    desc_act permutations (q/k/v and gate/up share the subset Hessian, so
    their act-order perms match in practice)."""
    if (m.g_idx is None) != (a.g_idx is None):
        return False
    if (m.act_perm is None) != (a.act_perm is None):
        return False
    if m.g_idx is not None:
        if m.act_perm is None:  # XLA-path g_idx modules: keep per-module
            return False
        return np.array_equal(np.asarray(m.g_idx), np.asarray(a.g_idx))
    return True


def _can_fuse(mods: list) -> bool:
    if not all(isinstance(m, QuantLinear) for m in mods):
        return False
    a = mods[0]
    return all(
        m.bits == a.bits
        and m.group_size == a.group_size
        and m.in_features == a.in_features
        and m.v1 == a.v1
        and _same_perm(m, a)
        and m.rt_layout == a.rt_layout
        and m.rt_block_k == a.rt_block_k
        and (m.bias is None) == (a.bias is None)
        and (m.lora_A is None)  # adapters stay per-module; skip fusion
        for m in mods
    )


def _concat_quant(mods: list[QuantLinear]) -> QuantLinear:
    """Concatenate along out-features (the lane axis of every tensor)."""
    a = mods[0]
    cat = lambda f: jnp.concatenate([jnp.asarray(getattr(m, f)) for m in mods], axis=-1)
    return QuantLinear(
        qweight=cat("qweight"),
        qzeros=cat("qzeros"),
        scales=cat("scales"),
        g_idx=a.g_idx,
        bias=cat("bias") if a.bias is not None else None,
        zvals=cat("zvals") if a.zvals is not None else None,
        act_perm=a.act_perm,
        bits=a.bits,
        group_size=a.group_size,
        in_features=a.in_features,
        out_features=sum(m.out_features for m in mods),
        sym=a.sym,
        v1=a.v1,
        rt_layout=a.rt_layout,
        rt_block_k=a.rt_block_k,
        # keep the sym fast path: a uniform zero point survives fusion iff
        # every member shares it (dropping this silently demotes fused
        # modules to the slower zvals kernel)
        zero_const=(
            a.zero_const
            if all(m.zero_const == a.zero_const for m in mods) else -1.0
        ),
    )


def stack_moe_experts(spec: ModelSpec, params: dict) -> dict:
    """In-place: stack DENSE expert weights into [E, D, F] tensors so the
    forward can use one ``jax.lax.ragged_dot`` (TPU gmm) per projection
    instead of E full-batch matmuls — tokens are sorted by expert and each
    expert touches only its routed rows (SURVEY round-2 priority 'ragged MoE
    dispatch'; the reference delegates this regime to vLLM's grouped gemm).

    Quantized (packed) experts are left untouched — dequantizing them to
    stack would forfeit the memory savings; a packed ragged kernel is the
    planned Pallas follow-up.
    """
    from gptqmodel_tpu.models.transformer import model_layers

    n_stacked = 0
    for lp in model_layers(spec, params):
        for key in ("mlp", "block_sparse_moe", "feed_forward"):
            mp = lp.get(key)
            if not isinstance(mp, dict) or "experts" not in mp:
                continue
            experts = mp["experts"]
            names = (
                ("w1", "w3", "w2") if "w1" in experts[0]
                else ("gate_proj", "up_proj", "down_proj")
            )
            g, u, d = names
            from gptqmodel_tpu.ops.qlinear import QuantLinear

            from gptqmodel_tpu.ops.registry import _on_tpu, get_backend

            backend_ok = get_backend() in ("pallas", "pallas_interpret") or (
                get_backend() == "auto" and _on_tpu()
            )
            if backend_ok and all(
                isinstance(e.get(g), QuantLinear) for e in experts
            ):
                # PACKED experts -> grouped dequant-GEMM kernel
                # (ops/pallas_qmoe): weights stay at bits/8 bytes in HBM and
                # only routed experts stream per step
                from gptqmodel_tpu.ops.pallas_qmoe import (
                    fuse_gate_up,
                    stack_packed_experts,
                )

                sq = {
                    "gate": stack_packed_experts([e[g] for e in experts]),
                    "up": stack_packed_experts([e[u] for e in experts]),
                    "down": stack_packed_experts([e[d] for e in experts]),
                }
                if all(v is not None for v in sq.values()):
                    # fused gate|up: one grouped kernel + one xs stream for
                    # both projections per layer
                    fused = fuse_gate_up(sq["gate"], sq["up"])
                    if fused is not None:
                        sq = {"gateup": fused, "down": sq["down"]}
                    mp["experts_stacked_q"] = sq
                    del mp["experts"]
                    n_stacked += 1
                continue
            if not all(
                isinstance(e.get(n), dict) and "weight" in e[n]
                and e[n].get("bias") is None
                for e in experts for n in names
            ):
                continue  # exotic experts: keep the loop path
            mp["experts_stacked"] = {
                # ragged_dot rhs layout [E, in, out]
                "gate": jnp.stack([jnp.asarray(e[g]["weight"]).T for e in experts]),
                "up": jnp.stack([jnp.asarray(e[u]["weight"]).T for e in experts]),
                "down": jnp.stack([jnp.asarray(e[d]["weight"]).T for e in experts]),
            }
            del mp["experts"]
            n_stacked += 1
    if n_stacked:
        log.info("stacked %d MoE expert groups for ragged dispatch", n_stacked)
    return params


def enable_fused_mlp(spec: ModelSpec, params: dict) -> dict:
    """In-place: prepare layer MLPs for the fused single-kernel path
    (ops/pallas_qmlp): requires a fused ``gate_up_proj`` (run
    fuse_projections first) and the down projection repacked to the kernel's
    8-group F-tile. Ineligible layers are left untouched (the per-projection
    path still works)."""
    from gptqmodel_tpu.ops.pack import repack_rt, unrepack_rt
    from gptqmodel_tpu.ops.pallas_qmlp import qmlp_supported
    from gptqmodel_tpu.models.transformer import model_layers

    n_enabled = 0
    for lp in model_layers(spec, params):
        mlp = lp.get("mlp")
        if not isinstance(mlp, dict):
            continue
        gu, down = mlp.get("gate_up_proj"), mlp.get("down_proj")
        if not (isinstance(gu, QuantLinear) and isinstance(down, QuantLinear)):
            continue
        if not (gu.rt_layout and down.rt_layout
                and gu.zero_const >= 0 and down.zero_const >= 0):
            continue
        if gu.bits in (3, 5, 6, 7) or down.bits in (3, 5, 6, 7):
            # plane-split rt layout: the qmlp kernel reads 2/4/8-bit rt
            # and the 8-group repack below would corrupt plane tiles
            continue
        g = down.group_size if down.group_size > 0 else down.in_features
        bf = 8 * g
        if down.rt_block_k != bf:
            if down.in_features % bf:
                continue
            qw = unrepack_rt(
                np.asarray(down.qweight), down.bits, down.rt_block_k
            )
            import dataclasses

            mlp["down_proj"] = down = dataclasses.replace(
                down,
                qweight=jnp.asarray(repack_rt(qw, down.bits, bf)),
                rt_block_k=bf,
            )
        if qmlp_supported(
            bits=gu.bits, group_size=gu.group_size, D=gu.in_features,
            F=gu.out_features // 2, gu_rt_block_k=gu.rt_block_k,
            d_rt_block_k=down.rt_block_k, M=8,
        ):
            n_enabled += 1
    if n_enabled:
        log.info("fused-MLP kernel enabled on %d layers", n_enabled)
    return params


def fuse_projections(spec: ModelSpec, params: dict) -> dict:
    """In-place: merge attention q/k/v and mlp gate/up per layer when safe."""
    if spec.family != "llama":
        return params
    root = params["model"]
    n_fused = 0
    for lp in root["layers"]:
        attn = lp.get("self_attn", {})
        if all(k in attn for k in ("q_proj", "k_proj", "v_proj")):
            mods = [attn["q_proj"], attn["k_proj"], attn["v_proj"]]
            if _can_fuse(mods):
                attn["qkv_proj"] = _concat_quant(mods)
                del attn["q_proj"], attn["k_proj"], attn["v_proj"]
                n_fused += 1
        mlp = lp.get("mlp", {})
        if all(k in mlp for k in ("gate_proj", "up_proj")) and "experts" not in mlp:
            mods = [mlp["gate_proj"], mlp["up_proj"]]
            if _can_fuse(mods):
                mlp["gate_up_proj"] = _concat_quant(mods)
                del mlp["gate_proj"], mlp["up_proj"]
                n_fused += 1
    if n_fused:
        log.info("fused %d projection groups for inference", n_fused)
    return params
