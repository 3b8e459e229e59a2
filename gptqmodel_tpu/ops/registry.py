"""Kernel registry: capability contracts + auto-selection.

TPU-native version of the reference's importer (gptqmodel/utils/importer.py:
``select_quant_linear`` :495, ``build_kernel_support_maps`` :182): each
kernel declares what it supports; AUTO picks the highest-priority kernel
whose contract matches the module. Two kernels replace the reference's ~36
classes because XLA + one Pallas family cover every (bits, group, device)
cell that needed a bespoke CUDA kernel there:

| kernel   | priority | bits    | groups     | g_idx | platform |
|----------|----------|---------|------------|-------|----------|
| pallas   | 100      | 2,4,8   | contiguous | no    | tpu      |
| xla      | 10       | 2,3,4,8 | any        | yes   | all      |

``post_init_params`` prepares runtime arrays (zvals: float zero points) the Pallas
kernel consumes — the analog of reference ``gptqmodel_post_init`` buffer prep
(utils/model.py:1281, marlin repack at marlin.py:246).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from gptqmodel_tpu.ops import pack as packing
from gptqmodel_tpu.ops import pallas_qmatmul
from gptqmodel_tpu.ops.qlinear import QuantLinear, qlinear_forward_xla

log = logging.getLogger("gptqmodel_tpu")

# module-level backend override: "auto" | "xla" | "pallas" | "pallas_interpret"
_BACKEND = "auto"


def set_backend(name: str):
    global _BACKEND
    assert name in ("auto", "xla", "pallas", "pallas_interpret"), name
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


# decode attention is always XLA now (see set_attention_backend)
_ATTN_BACKEND = "auto"


def set_attention_backend(name: str):
    """Decode attention is ALWAYS XLA: the fused Pallas decode-attention
    kernel was measured at parity-or-worse across the whole KV range it
    supported (L=256: -0.6 ms; L=2048: +0.006; L=4096: +0.042 — session Y)
    and was removed (win-or-cut). The knob survives for the sharded-serving
    pin and tests; long-context prefill uses the chunked online-softmax
    path (transformer._chunked_causal_attention)."""
    global _ATTN_BACKEND
    assert name in ("auto", "xla"), name
    _ATTN_BACKEND = name


def attention_backend() -> str:
    return _ATTN_BACKEND


# expert-parallel context: (mesh, axis) or None. Set by serving/tests after
# parallel.expert.shard_expert_stacks; moe_mlp routes stacked dispatch
# through parallel.expert.moe_forward_ep when set (same pin pattern as the
# attention backend).
_EP_CTX = None


def set_expert_parallel(mesh=None, axis: str = "expert"):
    global _EP_CTX
    _EP_CTX = None if mesh is None else (mesh, axis)


def expert_parallel():
    return _EP_CTX


def select_kernel(p: QuantLinear) -> str:
    """Resolve the compute kernel for a packed module under the current
    backend setting. AUTO: pallas on TPU when the contract matches."""
    if _BACKEND == "xla":
        return "xla"
    eligible = p.zvals is not None and (
        (not p.planar and pallas_qmatmul.supports(
            p.bits, p.group_size, p.in_features, p.out_features,
            p.g_idx is None or p.act_perm is not None,
        ))
        # 3/5/6/7-bit have no interchange-layout kernel: eligible only
        # once post_init has produced the plane-split rt layout (sym OR
        # asym-zvals, r4) — this clause also admits the planar widths
        or (p.bits in (3, 5, 6, 7) and p.rt_layout)
    )
    if _BACKEND in ("pallas", "pallas_interpret"):
        if not eligible:
            raise ValueError(
                f"pallas kernel does not support this module: bits={p.bits} "
                f"group={p.group_size} g_idx={'set' if p.g_idx is not None else 'none'} "
                f"shape=({p.in_features},{p.out_features}) "
                f"zvals={'ready' if p.zvals is not None else 'missing — run post_init_params'}"
            )
        return _BACKEND
    return "pallas" if (eligible and _on_tpu()) else "xla"


# Above this many rows the matmul is compute-bound and the one-off XLA
# dequant materialization amortizes; the Pallas kernel would re-dequantize
# per M-block (prefill regime).
PALLAS_MAX_M = 256


def qlinear_forward(p: QuantLinear, x: jnp.ndarray) -> jnp.ndarray:
    if p.had_block:  # online rotation: weights live in the transformed space
        from gptqmodel_tpu.ops.hadamard import fht

        x = fht(x, p.had_block)
    if p.rot_theta is not None:  # ParoQuant learned input transform
        from gptqmodel_tpu.quantization.paroquant import apply_paro

        x = apply_paro(x, p.rot_theta, p.rot_scales, p.rot_group)
    kernel = select_kernel(p)
    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= int(d)
    # QQQ W4A8: int8 compute wins in the compute-bound (prefill) regime;
    # decode stays on the weight-streaming dequant kernels
    if p.a8 and rows >= 32 and p.g_idx is None and p.sym:
        from gptqmodel_tpu.ops.qlinear import qlinear_forward_a8

        return qlinear_forward_a8(p, x)
    # rt-layout modules stay on pallas at any M: the XLA fallback would have
    # to materialize + un-permute the full dense weight (HBM-prohibitive on
    # big models); the rt kernel needs no materialization at all.
    if kernel == "xla" or (
        kernel == "pallas" and rows > PALLAS_MAX_M and not p.rt_layout
    ):
        return qlinear_forward_xla(p, x)
    x2 = x.reshape(-1, x.shape[-1])
    if p.act_perm is not None:
        # desc_act: weights are stored group-contiguous in perm order; one
        # activation-column gather replaces per-row g_idx indirection
        x2 = x2[:, p.act_perm]
    y = pallas_qmatmul.qmatmul(
        x2, p.qweight, p.scales, p.zvals,
        bits=p.bits, group_size=p.group_size, rt=p.rt_layout,
        rt_block_k=p.rt_block_k,
        zero_const=p.zero_const if p.rt_layout else -1.0,
        interpret=(kernel == "pallas_interpret"),
    )
    y = y.reshape(*lead, p.out_features)
    if p.lora_A is not None:
        y = y + ((x @ p.lora_A.astype(x.dtype)) @ p.lora_B.astype(x.dtype))
    if p.bias is not None:
        y = y + p.bias.astype(y.dtype)
    return y


def qmlp_forward(gu: QuantLinear, down: QuantLinear, x: jnp.ndarray, act: str):
    """Fused gate_up+act+down MLP in one Pallas kernel (pallas_qmlp.qmlp).

    Returns the MLP output, or None when the contract doesn't hold (caller
    falls back to the per-projection path). Eligibility mirrors
    select_kernel's sym rt fast path, plus the fused-kernel layout contract
    (down repacked to 8-group tiles — optimize.enable_fused_mlp)."""
    if _BACKEND == "xla":
        return None
    if _BACKEND == "auto" and not _on_tpu():
        return None
    if not (gu.rt_layout and down.rt_layout):
        return None
    if gu.zero_const < 0 or down.zero_const < 0:
        return None
    if gu.bias is not None or gu.lora_A is not None or down.lora_A is not None:
        return None
    if gu.act_perm is not None or down.act_perm is not None:
        # desc_act: down's input is the in-kernel intermediate — its column
        # gather can't be applied between the fused stages
        return None
    if gu.bits != down.bits or gu.group_size != down.group_size:
        return None
    if gu.bits in (3, 5, 6, 7):  # plane-split rt: qmlp kernel reads 2/4/8
        return None
    if gu.had_block or down.had_block or gu.rot_theta is not None \
            or down.rot_theta is not None or gu.a8 or down.a8:
        return None
    if act not in ("silu", "gelu", "gelu_pytorch_tanh", "gelu_new", "relu"):
        return None
    from gptqmodel_tpu.ops import pallas_qmlp

    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= int(d)
    D = gu.in_features
    F = gu.out_features // 2
    if not pallas_qmlp.qmlp_supported(
        bits=gu.bits, group_size=gu.group_size, D=D, F=F,
        gu_rt_block_k=gu.rt_block_k, d_rt_block_k=down.rt_block_k, M=rows,
    ):
        return None
    y = pallas_qmlp.qmlp(
        x.reshape(-1, D), gu.qweight, gu.scales, down.qweight, down.scales,
        bits=gu.bits, group_size=gu.group_size, kt_gu=gu.rt_block_k,
        zc_gu=gu.zero_const, zc_d=down.zero_const, act=act,
        interpret=(_BACKEND == "pallas_interpret"),
    ).reshape(*lead, down.out_features)
    if down.bias is not None:
        y = y + down.bias.astype(y.dtype)
    return y


def _act_order_perm(p: QuantLinear) -> np.ndarray | None:
    """Stable sort of g_idx when it is a balanced grouping (every group has
    exactly ``group_size`` columns, groups 0..G-1) — i.e. a GPTQ act-order
    permutation of contiguous groups. Returns None otherwise (ragged custom
    g_idx stays on the XLA path)."""
    if p.g_idx is None:
        return None
    gi = np.asarray(p.g_idx)
    g = p.in_features if p.group_size in (-1, None) else p.group_size
    if p.in_features % g:
        return None
    G = p.in_features // g
    counts = np.bincount(gi, minlength=G)
    if counts.shape[0] != G or not (counts == g).all():
        return None
    perm = np.argsort(gi, kind="stable").astype(np.int32)
    return perm


def post_init_module(p: QuantLinear) -> QuantLinear:
    """Prepare runtime state for the fast kernel: float zero points, and —
    when the contract allows — the group-aligned rt repack of qweight
    (marlin-repack analog; reference marlin.py:246 post_init)."""
    if p.zvals is not None:
        return p
    zeros = packing.unpack_qzeros(
        np.asarray(p.qzeros), p.bits, v1=p.v1, planar=p.planar
    )
    zvals = zeros.astype(np.float32)
    # uniform zeros (sym quant) -> the kernel can drop the zvals input
    zero_const = float(zeros.flat[0]) if (zeros == zeros.flat[0]).all() else -1.0
    qweight, rt_layout, rt_bk = p.qweight, False, 0
    # desc_act (g_idx) fast path: when g_idx is a balanced permutation of
    # contiguous groups (always true for GPTQ act-order — each group keeps
    # exactly ``g`` columns), the stable sort of g_idx reorders weight rows
    # into contiguous groups. Baking that perm into the packed rows before
    # the rt repack lets act-order checkpoints run the same Pallas kernel as
    # contiguous ones, at the cost of one x-column gather per forward
    # (reference: exllamav2/cuda/q_matrix.cu builds this perm at load;
    # marlin.py:246-261 repacks with g_idx).
    act_perm = _act_order_perm(p)
    plane_bits = p.bits in (3, 5, 6, 7)
    if (
        (p.g_idx is None or act_perm is not None)
        # planar storage reaches the plane-split rt kernel; other planar
        # widths keep the XLA path
        and (not p.planar or plane_bits)
        and pallas_qmatmul.rt_supported(p.bits, p.group_size, p.in_features)
    ):
        rt_bk = pallas_qmatmul.rt_block_k_for(
            p.in_features, p.group_size, N=p.out_features, bits=p.bits
        )
        qw = np.asarray(p.qweight)
        if act_perm is not None:
            codes = packing.unpack_qweight(qw, p.bits, planar=p.planar)
            qw = packing.pack_qweight(codes[act_perm], p.bits,
                                      planar=p.planar)
        if plane_bits:
            qweight = jnp.asarray(
                packing.repack_rt_planes(qw, p.bits, rt_bk, planar=p.planar)
            )
        else:
            qweight = jnp.asarray(packing.repack_rt(qw, p.bits, rt_bk))
        rt_layout = True
    else:
        act_perm = None  # XLA path consumes g_idx natively; no perm needed
    return QuantLinear(
        qweight=qweight, qzeros=p.qzeros, scales=p.scales, g_idx=p.g_idx,
        bias=p.bias, zvals=jnp.asarray(zvals), lora_A=p.lora_A, lora_B=p.lora_B,
        rot_theta=p.rot_theta, rot_scales=p.rot_scales,
        act_perm=None if act_perm is None
        else jnp.asarray(act_perm, dtype=jnp.int32),
        bits=p.bits, group_size=p.group_size, in_features=p.in_features,
        out_features=p.out_features, sym=p.sym, v1=p.v1, planar=p.planar,
        a8=p.a8, had_block=p.had_block, rot_group=p.rot_group,
        zero_const=zero_const, rt_layout=rt_layout, rt_block_k=rt_bk,
    )


def post_init_params(tree):
    """Walk a params pytree, preparing every QuantLinear for fast inference.
    Analog of reference gptqmodel_post_init (utils/model.py:1281)."""
    if isinstance(tree, QuantLinear):
        return post_init_module(tree)
    from gptqmodel_tpu.ops.trellis import TrellisLinear, post_init_trellis

    if isinstance(tree, TrellisLinear):
        return post_init_trellis(tree)
    if isinstance(tree, dict):
        return {k: post_init_params(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [post_init_params(v) for v in tree]
    return tree
