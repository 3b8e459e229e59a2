"""Quantized-linear parameter pytrees + XLA reference forward.

TPU-native re-design of the reference kernel layer
(gptqmodel/nn_modules/qlinear/): instead of ~36 nn.Module kernel classes we
keep **data** (a params pytree) separate from **compute** (functions picked
from a small registry, see ``registry.py``). The XLA path here is the
executable reference semantics — the analog of the reference's TorchLinear
(torch.py:302) that every fast kernel is validated against.

Dequant semantics match the v1/v2 interchange spec in ``pack.py``:
``w[i, o] = scales[g_idx[i], o] * (codes[i, o] - zeros[g_idx[i], o])`` and
``y = x @ w + b``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gptqmodel_tpu.ops import pack as packing


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["qweight", "qzeros", "scales", "g_idx", "bias", "zvals", "lora_A", "lora_B", "rot_theta", "rot_scales", "act_perm"],
    meta_fields=["bits", "group_size", "in_features", "out_features", "sym", "v1", "rt_layout", "rt_block_k", "planar", "a8", "had_block", "rot_group", "zero_const"],
)
@dataclasses.dataclass
class QuantLinear:
    """Packed quantized linear layer as a plain pytree.

    Data leaves are jnp/np arrays in the GPTQ interchange layout; metadata is
    static so jit specializes per (bits, group, shape) — the TPU analog of the
    reference's per-kernel class attributes (SUPPORTS_BITS etc.).

    ``g_idx`` is None when groups are contiguous (no desc_act import), letting
    kernels use the fast group-blocked path. ``v1`` marks qzeros still in
    v1 (-1 offset) form; runtime params should be converted to v2 at load.
    """

    qweight: jnp.ndarray  # int32 [in/pf, out]
    qzeros: jnp.ndarray  # int32 [groups, out/pf]
    scales: jnp.ndarray  # f16/f32/bf16 [groups, out]
    g_idx: jnp.ndarray | None  # int32 [in] or None (contiguous groups)
    bias: jnp.ndarray | None
    # runtime-only (post_init_params): float zero points for the fused
    # kernel; never serialized (writer skips it)
    zvals: jnp.ndarray | None = None
    # EoRA/LoRA adapter: y += (x @ lora_A) @ lora_B (A [in, r], B [r, out]);
    # saved as a sidecar in HF-adapter format, not in the base checkpoint
    lora_A: jnp.ndarray | None = None
    lora_B: jnp.ndarray | None = None
    # ParoQuant learned input transform (reference paroquant/optimization.py):
    # runtime applies channel scales + pairwise Givens rotations to x before
    # the packed matmul (pairs derived from the round-robin template)
    rot_theta: jnp.ndarray | None = None  # [rounds, in/2]
    rot_scales: jnp.ndarray | None = None  # [in]
    # desc_act fast path (runtime-only, post_init_params): the stable sort
    # of g_idx that makes groups contiguous. qweight rows are stored in this
    # order (then rt-repacked) and the forward gathers x columns by it —
    # the load-time-perm trick of the reference's exllama kernels
    # (gptqmodel_ext/exllamav2/cuda/q_matrix.cu builds the same perm at
    # load; marlin.py:246-261 repacks with g_idx). Never serialized.
    act_perm: jnp.ndarray | None = None  # int32 [in]
    bits: int = 4
    group_size: int = 128
    in_features: int = 0
    out_features: int = 0
    sym: bool = True
    v1: bool = False
    # qweight repacked to the kernel's group-aligned rt layout (post-init;
    # marlin-repack analog). Export/dequant reverse it via pack.unrepack_rt.
    rt_layout: bool = False
    rt_block_k: int = 0
    # split-plane (gptq_p) packing — native 5/6/7-bit layout, always v2
    # zeros (reference docs/gptq_planar.md)
    planar: bool = False
    # QQQ W4A8 runtime: dynamic int8 activations + int8 matmul (sym weights)
    a8: bool = False
    # online-Hadamard block (QuaRot online transform, reference set_had_K
    # qlinear/__init__.py:485): >0 means the PACKED weights live in the
    # blockwise-Hadamard-transformed input space and the forward applies
    # fht(x, had_block) first (done by registry.qlinear_forward)
    had_block: int = 0
    # ParoQuant rotation group (0 = no paro transform)
    rot_group: int = 0
    # uniform zero point (sym quant), set by post_init when every zero is
    # equal: enables the zvals-free rt kernel variant (-1 = non-uniform)
    zero_const: float = -1.0

    @property
    def n_groups(self) -> int:
        return self.scales.shape[0]


def make_quant_linear(
    *,
    Q: np.ndarray,  # int codes [out, in] (solver output order)
    scales: np.ndarray,  # [groups, out]
    zeros: np.ndarray,  # [groups, out] integer zero points (v2 semantics)
    g_idx: np.ndarray | None,  # [in] or None
    bias: np.ndarray | None,
    bits: int,
    group_size: int,
    sym: bool = True,
    v1: bool = False,
    planar: bool = False,
    a8: bool = False,
    had_block: int = 0,
    scales_dtype=np.float16,
) -> QuantLinear:
    """Pack solver output into a QuantLinear (host-side, numpy)."""
    out_f, in_f = Q.shape
    g = in_f if group_size in (-1, None) else group_size
    if bits in packing.PLANAR_ONLY_BITS:
        planar = True  # 5/6/7-bit have no continuous layout
    if planar:
        assert not v1, "planar (gptq_p) always uses v2 zero semantics"
    qweight = packing.pack_qweight(np.ascontiguousarray(Q.T), bits, planar=planar)
    qzeros = packing.pack_qzeros(np.asarray(zeros), bits, v1=v1, planar=planar)
    contiguous = np.arange(in_f) // g
    if g_idx is not None and np.array_equal(np.asarray(g_idx), contiguous):
        g_idx = None  # fast path: no indirection needed
    return QuantLinear(
        qweight=qweight,
        qzeros=qzeros,
        scales=np.asarray(scales, dtype=scales_dtype),
        g_idx=None if g_idx is None else np.asarray(g_idx, dtype=np.int32),
        bias=None if bias is None else np.asarray(bias),
        bits=bits,
        group_size=group_size,
        in_features=in_f,
        out_features=out_f,
        sym=sym,
        v1=v1,
        planar=planar,
        a8=a8,
        had_block=had_block,
    )


# --------------------------------------------------------------------------
# XLA reference compute path
# --------------------------------------------------------------------------


def dequantize_weight(p: QuantLinear, dtype=jnp.float32) -> jnp.ndarray:
    """Unpack + dequantize to dense ``w [in, out]`` (y = x @ w).

    Executable reference semantics (analog of reference
    qlinear/__init__.py:947 dequantize_weight).
    """
    if p.rt_layout and p.bits in (3, 5, 6, 7):  # plane-split rt layout
        codes = packing.rt_planes_decode_jnp(
            p.qweight, p.in_features, p.rt_block_k, p.bits
        )
        if p.planar:
            zeros = packing.planar_unpack_axis0_jnp(
                p.qzeros.T, p.bits
            ).T.astype(jnp.int32)
        else:
            zeros = packing.unpack_qzeros_jnp(p.qzeros, p.bits, v1=p.v1)
    elif p.planar:
        codes = packing.planar_unpack_axis0_jnp(p.qweight, p.bits)  # [in, out]
        zeros = packing.planar_unpack_axis0_jnp(p.qzeros.T, p.bits).T
        zeros = zeros.astype(jnp.int32)
    else:
        codes = packing.unpack_qweight_jnp(p.qweight, p.bits)  # [in, out]
        zeros = packing.unpack_qzeros_jnp(p.qzeros, p.bits, v1=p.v1)  # [G, out]
    if p.rt_layout and p.bits not in (3, 5, 6, 7):  # jit-safe rt reverse
        perm = packing.rt_row_permutation(p.in_features, p.bits, p.rt_block_k)
        codes = codes[jnp.asarray(np.argsort(perm))]
    if p.act_perm is not None:  # desc_act runtime order -> original order
        codes = codes[jnp.argsort(jnp.asarray(p.act_perm))]
    scales = p.scales.astype(dtype)
    if p.g_idx is not None:
        s = scales[p.g_idx]  # [in, out]
        z = zeros[p.g_idx]
        return s * (codes - z).astype(dtype)
    g = p.in_features if p.group_size in (-1, None) else p.group_size
    in_f, out_f = codes.shape
    # short last group (tp_pad / non-multiple in_features): repeat covers
    # ceil(in/g) groups, slice back to in_f
    z = jnp.repeat(zeros, g, axis=0)[:in_f]
    s = jnp.repeat(scales, g, axis=0)[:in_f]
    return (codes - z).astype(dtype) * s


def qlinear_forward_xla(p: QuantLinear, x: jnp.ndarray) -> jnp.ndarray:
    """Reference forward: dequantize -> matmul. Works on any backend.

    Matmul runs in the activation dtype (bf16 on TPU feeds the MXU). For
    bf16 activations the dequant also runs in bf16 — (codes - zeros) is
    exact there (small ints), only the scale multiply rounds, and the full
    [in, out] f32 materialization would otherwise dominate HBM on large
    models (prefill path).
    """
    if x.dtype == jnp.bfloat16:
        w = dequantize_weight(p, dtype=jnp.bfloat16)
    else:
        w = dequantize_weight(p, dtype=jnp.float32).astype(x.dtype)
    y = jnp.matmul(x, w)
    if p.lora_A is not None:  # EoRA/LoRA fused apply (reference adapter.py:148)
        y = y + (x @ p.lora_A.astype(x.dtype)) @ p.lora_B.astype(x.dtype)
    if p.bias is not None:
        y = y + p.bias.astype(y.dtype)
    return y


def qlinear_forward_a8(p: QuantLinear, x: jnp.ndarray) -> jnp.ndarray:
    """QQQ W4A8 runtime (reference qqq.py / marlin-qqq kernel semantics,
    TPU-natively): dynamic per-token symmetric int8 activations, int8xint8
    MXU matmuls accumulated in int32 PER GROUP, then one f32 scale-combine:

        y[m, n] = s_x[m] * sum_g  s_w[g, n] * (x8[m, g, :] . w8[g, :, n])

    Weight codes are symmetric 4-bit (zero = 8), so ``w8 = codes - 8`` fits
    int8 exactly. Compute-bound regimes (prefill) get the MXU's 2x int8
    rate; decode stays on the weight-streaming dequant kernels.
    """
    assert p.sym and p.g_idx is None, "QQQ a8 path requires sym + contiguous groups"
    lead = x.shape[:-1]
    K = p.in_features
    g = K if p.group_size in (-1, None) else p.group_size
    G = K // g
    x2 = x.reshape(-1, K).astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(x2), axis=1) / 127.0, 1e-8)
    x8 = jnp.clip(jnp.round(x2 / s_x[:, None]), -127, 127).astype(jnp.int8)

    codes = packing.unpack_qweight_jnp(p.qweight, p.bits)  # [K, N] int32
    if p.rt_layout:  # post_init repacked for the dequant kernel; undo
        perm = packing.rt_row_permutation(p.in_features, p.bits, p.rt_block_k)
        codes = codes[jnp.asarray(np.argsort(perm))]
    zero = (2 ** p.bits) // 2
    w8 = (codes - zero).astype(jnp.int8)
    M = x8.shape[0]
    acc = jax.lax.dot_general(
        x8.reshape(M, G, g).transpose(1, 0, 2),  # [G, M, g]
        w8.reshape(G, g, p.out_features),  # [G, g, N]
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # [G, M, N]
    sw = p.scales.astype(jnp.float32)  # [G, N]
    y = jnp.einsum("gmn,gn->mn", acc.astype(jnp.float32), sw)
    y = (y * s_x[:, None]).astype(x.dtype)
    if p.lora_A is not None:
        y = y + ((x2 @ p.lora_A.astype(jnp.float32))
                 @ p.lora_B.astype(jnp.float32)).astype(x.dtype)
    if p.bias is not None:
        y = y + p.bias.astype(y.dtype)
    return y.reshape(*lead, p.out_features)
