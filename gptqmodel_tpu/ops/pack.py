"""GPTQ packed-weight formats — bit-exact v1/v2 interchange.

Implements the on-disk layout of the reference GPTQ checkpoints
(spec derived from gptqmodel/nn_modules/qlinear/__init__.py:947
``dequantize_weight`` and ``pack_block`` :1036):

- ``qweight``: int32 ``[in_features/pack_factor, out_features]``; word at row
  ``r`` packs codes for input rows ``r*pf + j`` at bit offset ``bits*j``
  (little-endian within the word), ``pf = 32 // bits``.
- ``qzeros``: int32 ``[n_groups, out_features/pack_factor]``; word at col ``c``
  packs the integer zero-points for output cols ``c*pf + j`` at offset
  ``bits*j``. **v1 stores (zero - 1) mod 2^bits** (the historic GPTQ quirk);
  v2 stores true zeros. v1 is the interchange format, v2 the runtime format.
- ``scales``: float16 ``[n_groups, out_features]``.
- ``g_idx``: int32 ``[in_features]`` mapping input row -> group index.
- 3-bit packs 32 values into 3 words with cross-word stitching: values 10 and
  21 straddle word boundaries (spec: qlinear/__init__.py:985-1000).

Dequant semantics (all formats): ``w[i, o] = scales[g_idx[i], o] *
(codes[i, o] - zeros[g_idx[i], o])`` giving the weight **transposed** relative
to the usual [out, in] — i.e. ``y = x @ w``.

Host-side packing is vectorized numpy (the TPU analog of the reference's
threaded C++ ``pack_block`` CPU packer); device-side unpacking has jnp twins
used by the XLA reference kernel.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PACK_DTYPE_BITS = 32

# 3-bit layout tables: (word, shift) of the *low* bit of each of the 32 values
# in a pack unit. Values 10 and 21 straddle words (see module docstring).
_B3_LOW = [(0, 3 * k) for k in range(10)] + [(0, 30)]  # v0..v10-low
_B3_LOW += [(1, 1 + 3 * k) for k in range(10)] + [(1, 31)]  # v11..v21-low
_B3_LOW += [(2, 2 + 3 * k) for k in range(10)]  # v22..v31


def pack_factor(bits: int) -> int:
    if bits == 3:
        return 32  # per 3-word unit
    return PACK_DTYPE_BITS // bits


# --------------------------------------------------------------------------
# numpy pack (host)
# --------------------------------------------------------------------------


_NATIVE_PACK_MIN_ELEMS = 1 << 20  # below this, numpy wins on call overhead


def _native_pack(codes_u32: np.ndarray, bits: int, planar: bool):
    """Threaded C++ packer (csrc/pack.cpp); None -> numpy fallback."""
    import ctypes
    import os

    from gptqmodel_tpu.utils.cpp import pack_ext

    lib = pack_ext()
    if lib is None:
        return None
    n, m = codes_u32.shape
    src = np.ascontiguousarray(codes_u32.view(np.int32))
    out = np.empty((n * bits // 32, m), np.int32)
    threads = min(os.cpu_count() or 1, 16)
    fn = lib.pack_axis0_planar if planar else lib.pack_axis0_cont
    i32p = ctypes.POINTER(ctypes.c_int32)
    fn(src.ctypes.data_as(i32p), out.ctypes.data_as(i32p), n, m, bits, threads)
    return out


def _pack_axis0_np(codes: np.ndarray, bits: int) -> np.ndarray:
    """Pack uint codes along axis 0. [n, m] -> [n*bits/32, m] int32."""
    codes = np.ascontiguousarray(codes, dtype=np.uint32)
    n, m = codes.shape
    if bits in (1, 2, 4, 8):
        pf = 32 // bits
        assert n % pf == 0, f"rows {n} not divisible by pack_factor {pf}"
        if bits != 1 and codes.size >= _NATIVE_PACK_MIN_ELEMS:
            out = _native_pack(codes, bits, planar=False)
            if out is not None:
                return out
        c = codes.reshape(n // pf, pf, m)
        shifts = (np.arange(pf, dtype=np.uint32) * bits)[None, :, None]
        out = np.bitwise_or.reduce(c << shifts, axis=1)
        return out.astype(np.uint32).view(np.int32)
    if bits == 3:
        assert n % 32 == 0, f"rows {n} not divisible by 32 (3-bit unit)"
        v = codes.reshape(n // 32, 32, m)
        words = np.zeros((n // 32, 3, m), dtype=np.uint64)
        for k, (w, s) in enumerate(_B3_LOW):
            if k == 10:
                words[:, 0] |= (v[:, 10].astype(np.uint64) & 0x3) << 30
                words[:, 1] |= v[:, 10].astype(np.uint64) >> 2
            elif k == 21:
                words[:, 1] |= (v[:, 21].astype(np.uint64) & 0x1) << 31
                words[:, 2] |= v[:, 21].astype(np.uint64) >> 1
            else:
                words[:, w] |= v[:, k].astype(np.uint64) << s
        return (
            (words & 0xFFFFFFFF)
            .astype(np.uint32)
            .view(np.int32)
            .reshape(n * 3 // 32, m)
        )
    raise NotImplementedError(f"bits={bits}")


def _unpack_axis0_np(packed: np.ndarray, bits: int) -> np.ndarray:
    """Inverse of _pack_axis0_np. [p, m] int32 -> [n, m] int32 codes."""
    u = packed.view(np.uint32) if packed.dtype == np.int32 else packed
    p, m = u.shape
    if bits in (1, 2, 4, 8):
        pf = 32 // bits
        shifts = (np.arange(pf, dtype=np.uint32) * bits)[None, :, None]
        vals = (u[:, None, :] >> shifts) & ((1 << bits) - 1)
        return vals.reshape(p * pf, m).astype(np.int32)
    if bits == 3:
        assert p % 3 == 0
        w = u.reshape(p // 3, 3, m).astype(np.uint64)
        out = np.empty((p // 3, 32, m), dtype=np.uint64)
        for k, (wi, s) in enumerate(_B3_LOW):
            if k == 10:
                out[:, 10] = ((w[:, 0] >> 30) & 0x3) | ((w[:, 1] & 0x1) << 2)
            elif k == 21:
                out[:, 21] = ((w[:, 1] >> 31) & 0x1) | ((w[:, 2] & 0x3) << 1)
            else:
                out[:, k] = (w[:, wi] >> s) & 0x7
        return out.reshape(p * 32 // 3, m).astype(np.int32)
    raise NotImplementedError(f"bits={bits}")


def pack_qweight(codes_in_out: np.ndarray, bits: int, planar: bool = False) -> np.ndarray:
    """Pack integer codes [in, out] -> qweight int32 [in/pf, out]."""
    if planar:
        return planar_pack_axis0(codes_in_out, bits)
    return _pack_axis0_np(codes_in_out, bits)


def unpack_qweight(qweight: np.ndarray, bits: int, planar: bool = False) -> np.ndarray:
    """qweight int32 [in/pf, out] -> codes int32 [in, out]."""
    if planar:
        return planar_unpack_axis0(qweight, bits)
    return _unpack_axis0_np(qweight, bits)


def pack_qzeros(
    zeros_g_out: np.ndarray, bits: int, v1: bool = False, planar: bool = False
) -> np.ndarray:
    """Pack integer zero-points [groups, out] -> qzeros int32 [groups, out/pf].

    ``v1=True`` stores (zero - 1) mod 2^bits (GPTQ v1 on-disk quirk; planar
    checkpoints always use true v2 zeros).
    """
    z = np.asarray(zeros_g_out, dtype=np.int64)
    if v1:
        assert not planar, "planar (gptq_p) never uses v1 zero semantics"
        z = (z - 1) & ((1 << bits) - 1)
    if planar:
        return planar_pack_axis0(z.T.astype(np.uint32), bits).T.copy()
    return _pack_axis0_np(z.T.astype(np.uint32), bits).T.copy()


def unpack_qzeros(
    qzeros: np.ndarray, bits: int, v1: bool = False, planar: bool = False
) -> np.ndarray:
    """qzeros int32 [groups, out/pf] -> zeros int32 [groups, out]."""
    if planar:
        return planar_unpack_axis0(
            np.ascontiguousarray(qzeros.T), bits
        ).T.astype(np.int32)
    z = _unpack_axis0_np(np.ascontiguousarray(qzeros.T), bits).T
    if v1:
        z = (z + 1) & ((1 << bits) - 1)
    return z.astype(np.int32)


def convert_qzeros_v1_to_v2(qzeros: np.ndarray, bits: int) -> np.ndarray:
    """Packed-domain v1 -> v2 (adds 1 to each field, wrapping in-field).

    Mirrors reference convert_gptq_v1_to_v2_format (utils/model.py:750) which
    operates on the packed words directly.
    """
    return pack_qzeros(unpack_qzeros(qzeros, bits, v1=True), bits, v1=False)


def convert_qzeros_v2_to_v1(qzeros: np.ndarray, bits: int) -> np.ndarray:
    return pack_qzeros(unpack_qzeros(qzeros, bits, v1=False), bits, v1=True)


# --------------------------------------------------------------------------
# jnp unpack (device, jittable) — used by the XLA reference kernel
# --------------------------------------------------------------------------


def unpack_qweight_jnp(qweight: jnp.ndarray, bits: int) -> jnp.ndarray:
    """qweight int32 [in/pf, out] -> codes int32 [in, out] (jittable)."""
    u = qweight.astype(jnp.uint32)
    p, m = u.shape
    if bits in (2, 4, 8):
        pf = 32 // bits
        shifts = (jnp.arange(pf, dtype=jnp.uint32) * bits)[None, :, None]
        vals = (u[:, None, :] >> shifts) & jnp.uint32((1 << bits) - 1)
        return vals.reshape(p * pf, m).astype(jnp.int32)
    if bits == 3:
        w = u.reshape(p // 3, 3, m)
        cols = []
        for k, (wi, s) in enumerate(_B3_LOW):
            if k == 10:
                v = ((w[:, 0] >> 30) & 0x3) | ((w[:, 1] & 0x1) << 2)
            elif k == 21:
                v = ((w[:, 1] >> 31) & 0x1) | ((w[:, 2] & 0x3) << 1)
            else:
                v = (w[:, wi] >> s) & 0x7
            cols.append(v)
        return jnp.stack(cols, axis=1).reshape(p * 32 // 3, m).astype(jnp.int32)
    raise NotImplementedError(f"bits={bits}")


def unpack_qzeros_jnp(qzeros: jnp.ndarray, bits: int, v1: bool = False) -> jnp.ndarray:
    z = unpack_qweight_jnp(qzeros.T, bits).T
    if v1:
        z = (z + 1) & ((1 << bits) - 1)
    return z.astype(jnp.int32)


# --------------------------------------------------------------------------
# planar (gptq_p) split-plane packing — native 5/6/7-bit format
# --------------------------------------------------------------------------

# bits -> ((plane_width, bit_offset), ...) low to high. Every plane width
# divides 32, so no code straddles a word boundary (spec:
# reference docs/gptq_planar.md, utils/planar_packing.py). Single-plane
# widths (2/4/8) are bit-identical to the continuous layout.
_PLANAR_PLANES = {
    2: ((2, 0),),
    3: ((2, 0), (1, 2)),
    4: ((4, 0),),
    5: ((4, 0), (1, 4)),
    6: ((4, 0), (2, 4)),
    7: ((4, 0), (2, 4), (1, 6)),
    8: ((8, 0),),
}

PLANAR_ONLY_BITS = (5, 6, 7)  # widths with no continuous layout


def planar_pack_axis0(codes: np.ndarray, bits: int) -> np.ndarray:
    """Pack codes [n, m] along axis 0 into planar words [n*bits/32, m].

    Per 32-code block: ``bits`` adjacent int32 words, low plane first; plane
    of width w stores codes ``i*(32/w)..`` in word i at shifts ``w*j``.
    """
    codes = np.ascontiguousarray(codes, dtype=np.uint32)
    n, m = codes.shape
    assert n % 32 == 0, f"planar packing needs rows % 32 == 0, got {n}"
    if codes.size >= _NATIVE_PACK_MIN_ELEMS:
        out = _native_pack(codes, bits, planar=True)
        if out is not None:
            return out
    blocks = n // 32
    x = codes.reshape(blocks, 32, m)
    out = np.zeros((blocks, bits, m), dtype=np.uint32)
    row = 0
    for w, off in _PLANAR_PLANES[bits]:
        pf = 32 // w
        plane = (x >> np.uint32(off)) & np.uint32((1 << w) - 1)
        resh = plane.reshape(blocks, w, pf, m)
        shifts = (np.arange(pf, dtype=np.uint32) * w)[None, None, :, None]
        out[:, row : row + w] = np.bitwise_or.reduce(resh << shifts, axis=2)
        row += w
    return out.reshape(blocks * bits, m).view(np.int32)


def planar_unpack_axis0(packed: np.ndarray, bits: int) -> np.ndarray:
    """Inverse of planar_pack_axis0: [n*bits/32, m] -> codes [n, m] int32."""
    u = packed.view(np.uint32) if packed.dtype == np.int32 else packed.astype(np.uint32)
    p, m = u.shape
    assert p % bits == 0, f"planar rows {p} not divisible by bits {bits}"
    blocks = p // bits
    words = u.reshape(blocks, bits, m)
    out = np.zeros((blocks, 32, m), dtype=np.uint32)
    row = 0
    for w, off in _PLANAR_PLANES[bits]:
        pf = 32 // w
        shifts = (np.arange(pf, dtype=np.uint32) * w)[None, None, :, None]
        vals = (words[:, row : row + w][:, :, None] >> shifts) & np.uint32(
            (1 << w) - 1
        )
        out |= vals.reshape(blocks, 32, m) << np.uint32(off)
        row += w
    return out.reshape(blocks * 32, m).astype(np.int32)


def planar_unpack_axis0_jnp(packed: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Jittable twin of planar_unpack_axis0 (device-side dequant)."""
    u = packed.astype(jnp.uint32)
    p, m = u.shape
    blocks = p // bits
    words = u.reshape(blocks, bits, m)
    out = jnp.zeros((blocks, 32, m), dtype=jnp.uint32)
    row = 0
    for w, off in _PLANAR_PLANES[bits]:
        pf = 32 // w
        shifts = (jnp.arange(pf, dtype=jnp.uint32) * w)[None, None, :, None]
        vals = (words[:, row : row + w][:, :, None] >> shifts) & jnp.uint32(
            (1 << w) - 1
        )
        out = out | (vals.reshape(blocks, 32, m) << jnp.uint32(off))
        row += w
    return out.reshape(blocks * 32, m).astype(jnp.int32)


# --------------------------------------------------------------------------
# AWQ GEMM format import (AutoAWQ checkpoints)
# --------------------------------------------------------------------------

# AWQ packs along the OUT dim with a nibble interleave: field j of a word
# holds output column c*pf + AWQ_ORDER[j]
# (spec: reference quantization/awq/utils/packing_utils.py)
_AWQ_ORDER_4BIT = [0, 2, 4, 6, 1, 3, 5, 7]


def unpack_awq_gemm(packed: np.ndarray, bits: int = 4) -> np.ndarray:
    """AWQ-gemm packed int32 [rows, out/pf] -> codes [rows, out].

    Works for both qweight ([in, out/pf]) and qzeros ([G, out/pf]); AWQ
    stores true zeros (no -1 quirk).
    """
    assert bits == 4, "AWQ gemm import currently supports 4-bit"
    pf = 32 // bits
    u = np.ascontiguousarray(packed).view(np.uint32)
    rows, pcols = u.shape
    vals = np.empty((rows, pcols, pf), dtype=np.int32)
    for j, col in enumerate(_AWQ_ORDER_4BIT):
        vals[:, :, col] = ((u >> np.uint32(bits * j)) & 0xF).astype(np.int32)
    return vals.reshape(rows, pcols * pf)


def awq_gemm_to_gptq(
    qweight: np.ndarray, qzeros: np.ndarray, bits: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """AWQ-gemm tensors -> (qweight, qzeros) in the GPTQ v2 layout."""
    codes = unpack_awq_gemm(qweight, bits)  # [in, out]
    zeros = unpack_awq_gemm(qzeros, bits)  # [G, out]
    return pack_qweight(codes, bits), pack_qzeros(zeros, bits, v1=False)


def awq_gemv_to_gptq(
    qweight: np.ndarray,  # int32 [out, in/8] — sequential nibbles along in
    qzeros: np.ndarray,  # int32 [out, zeros_width] — group zeros, 8/word
    scales: np.ndarray,  # f16 [out, zeros_width*8] — padded group scales
    group_size: int,
    bits: int = 4,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """AWQ gemv tensors -> GPTQ v2 (qweight, qzeros, scales).

    Layout per the reference's AwqGEMVLinear.pack
    (gptqmodel/nn_modules/qlinear/gemv_awq.py:151): identity order_map (no
    gemm interleave), qweight packed along IN within [out, in/pf] words,
    zeros packed along the GROUP axis, scales/zeros padded to
    ``calculate_zeros_width(in, g) * pf`` columns. Zeros are true (v2)."""
    assert bits == 4, "reference gemv kernels are 4-bit only"
    pf = 32 // bits
    qweight = np.asarray(qweight)
    out_f = qweight.shape[0]
    in_f = qweight.shape[1] * pf
    G = in_f // group_size
    shifts = (np.arange(pf, dtype=np.uint32) * bits)[None, None, :]
    codes = (
        (qweight.astype(np.uint32)[:, :, None] >> shifts) & 0xF
    ).reshape(out_f, in_f).astype(np.int32)  # [out, in]
    zw = np.asarray(qzeros)
    zeros = (
        (zw.astype(np.uint32)[:, :, None] >> shifts) & 0xF
    ).reshape(out_f, -1)[:, :G].astype(np.int32)  # [out, G]
    s = np.asarray(scales)[:, :G]  # [out, G]
    return (
        pack_qweight(np.ascontiguousarray(codes.T), bits),
        pack_qzeros(np.ascontiguousarray(zeros.T), bits, v1=False),
        np.ascontiguousarray(s.T),
    )


def _gemv_fast_source_index(N: int, K: int) -> np.ndarray:
    """For each packed position (row, col, field) of the gemv-fast layout,
    the source flat index into codes [N, K] — derived by replaying the
    reference's pack_intweight index motion
    (gemv_fast_awq.py:23) on an index array, so the inverse is exact by
    construction."""
    src = np.arange(N * K, dtype=np.int64).reshape(N, K)
    x = src.reshape(N, K // 32, 4, 4, 2).transpose(0, 1, 3, 2, 4)
    x = x.reshape(N, K // 32, 4, 8)
    x = x.reshape(N, K // 32, 4, 4, 2).transpose(0, 1, 2, 4, 3)
    x = x.reshape(N, K)
    interleave, kstride = 4, 64
    x = x.reshape(N // interleave, interleave, K // kstride, kstride)
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(N // interleave, K // kstride, kstride, interleave)
    return x  # [N/4, K/64, 64, 4]: value = source flat index of that field


def awq_gemv_fast_to_gptq(
    qweight: np.ndarray,  # int16 [N/4, K] packed words
    scales: np.ndarray,  # f16 [padG, N] (transposed + padded)
    qzeros: np.ndarray,  # f16 [padG, N] = -(scales * zeros)
    group_size: int,
    bits: int = 4,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """AWQ gemv-fast tensors -> GPTQ v2 (qweight, qzeros, scales).

    Reference layout (gemv_fast_awq.py:234 pack + pack_intweight): codes
    double-permuted within 32-element K runs, rows interleaved by 4, four
    4-bit fields per int16 word; scales stored transposed [padG, N]; zeros
    stored as the precomputed float ``-(scale * zero)``."""
    assert bits == 4, "reference gemv-fast kernel is 4-bit only"
    qweight = np.asarray(qweight)
    n4, K = qweight.shape
    N = n4 * 4
    w = qweight.view(np.uint16) if qweight.dtype == np.int16 else qweight.astype(np.uint16)
    fields = np.stack(
        [(w >> np.uint16(4 * j)) & np.uint16(0xF) for j in range(4)], axis=-1
    ).reshape(n4, K // 64, 64, 4)
    idx = _gemv_fast_source_index(N, K)
    codes = np.empty(N * K, dtype=np.int32)
    codes[idx.reshape(-1)] = fields.reshape(-1).astype(np.int32)
    codes = codes.reshape(N, K)  # [out, in]
    G = K // group_size
    s = np.asarray(scales, np.float32)[:G]  # [G, N]
    zf = np.asarray(qzeros, np.float32)[:G]
    with np.errstate(divide="ignore", invalid="ignore"):
        z = np.where(s != 0, -zf / np.where(s == 0, 1.0, s), 0.0)
    zeros = np.clip(np.round(z), 0, 2**bits - 1).astype(np.int32)  # [G, N]
    return (
        pack_qweight(np.ascontiguousarray(codes.T), bits),
        pack_qzeros(zeros, bits, v1=False),
        np.ascontiguousarray(np.asarray(scales)[:G]),
    )


# --------------------------------------------------------------------------
# runtime (rt) layout: group-aligned bit-plane parts for the Pallas kernel
# --------------------------------------------------------------------------


def rt_row_permutation(K: int, bits: int, block_k: int) -> np.ndarray:
    """perm such that ``codes_rt[i] = codes[perm[i]]`` gives the rt layout.

    2/4-bit (bf16-magic kernel): within each K-tile of ``block_k`` rows,
    field j of word r holds logical row ``a*2R + 2r + h`` where
    ``a = j % (pf/2)``, ``h = j // (pf/2)``, ``R = block_k/pf`` — the paired
    magic extraction of fields (a, a+pf/2) plus the sublane-halving bitcast
    yields a CONTIGUOUS logical range per part (marlin-repack analog,
    reference gptq_marlin_repack.cu, done here as a host transform).

    8-bit (f32-magic kernel, 0x4B000000): no halving bitcast — extraction a
    emits word order directly, so field j of word r holds logical row
    ``j*R + r`` (plain plane-major within the tile), each plane covering
    whole groups.
    """
    pf = 32 // bits
    R = block_k // pf
    perm = np.empty(K, dtype=np.int64)
    base = np.arange(0, K, block_k)
    r = np.arange(R)
    for j in range(pf):
        pos = (base[:, None] + r[None, :] * pf + j).reshape(-1)
        if bits == 8:  # plane-major: plane j covers rows [j*R, (j+1)*R)
            logical = (base[:, None] + j * R + r[None, :]).reshape(-1)
        else:
            a, h = j % (pf // 2), j // (pf // 2)
            logical = (base[:, None] + a * 2 * R + 2 * r[None, :] + h).reshape(-1)
        perm[pos] = logical
    return perm


def repack_rt(qweight: np.ndarray, bits: int, block_k: int) -> np.ndarray:
    """Interchange qweight [K/pf, N] -> rt-layout packed words (same shape)."""
    codes = _unpack_axis0_np(np.asarray(qweight), bits)
    perm = rt_row_permutation(codes.shape[0], bits, block_k)
    return _pack_axis0_np(codes[perm], bits)


def unrepack_rt(
    qweight_rt: np.ndarray, bits: int, block_k: int, planar: bool = False
) -> np.ndarray:
    """rt-layout -> storage layout (for export/dequant)."""
    if bits in (3, 5, 6, 7):
        return unrepack_rt_planes(qweight_rt, bits, block_k, planar=planar)
    codes_rt = _unpack_axis0_np(np.asarray(qweight_rt), bits)
    perm = rt_row_permutation(codes_rt.shape[0], bits, block_k)
    inv = np.argsort(perm)
    return _pack_axis0_np(codes_rt[inv], bits)


def repack_rt_planes(
    qweight: np.ndarray, bits: int, block_k: int, planar: bool = False
) -> np.ndarray:
    """Non-power-of-two bits (3/5/6/7) -> plane-split rt layout [bits*K/32,
    N] (streams EXACTLY ``bits``/weight): per K-tile, one rt-permuted
    sub-array per bit plane of :data:`_PLANAR_PLANES` (3 = 2+1, 5 = 4+1,
    6 = 4+2, 7 = 4+2+1), each packed at its own width so the Pallas sym
    kernel's paired magic extraction yields contiguous group-aligned
    logical rows and recombines ``code = Σ plane << offset`` via
    DISTRIBUTED per-plane partial dots. Source layout: the stitched
    interchange format for 3-bit (``planar=False``) or gptq_p planar."""
    src = np.asarray(qweight)
    codes = (
        planar_unpack_axis0(src, bits) if planar
        else _unpack_axis0_np(src, bits)
    )
    K, _ = codes.shape
    assert K % block_k == 0, (K, block_k)
    planes = _PLANAR_PLANES[bits]
    perms = {w: rt_row_permutation(block_k, w, block_k) for w, _ in planes}
    tiles = []
    for t in range(K // block_k):
        c = codes[t * block_k : (t + 1) * block_k]
        for w, off in planes:
            tiles.append(
                _pack_axis0_np((c[perms[w]] >> off) & ((1 << w) - 1), w)
            )
    return np.vstack(tiles).astype(np.int32)


def unrepack_rt_planes(
    qweight_rt: np.ndarray, bits: int, block_k: int, planar: bool = False
) -> np.ndarray:
    """Inverse of :func:`repack_rt_planes` -> stitched (3-bit) or planar."""
    u = np.asarray(qweight_rt)
    rows_t = bits * block_k // 32
    assert u.shape[0] % rows_t == 0, (u.shape, block_k, bits)
    planes = _PLANAR_PLANES[bits]
    invs = {
        w: np.argsort(rt_row_permutation(block_k, w, block_k))
        for w, _ in planes
    }
    out = []
    for t in range(u.shape[0] // rows_t):
        tile = u[t * rows_t : (t + 1) * rows_t]
        c = None
        r0 = 0
        for w, off in planes:
            rw = block_k * w // 32
            part = _unpack_axis0_np(tile[r0 : r0 + rw], w)[invs[w]] << off
            c = part if c is None else (c | part)
            r0 += rw
        out.append(c)
    codes = np.vstack(out)
    return (
        planar_pack_axis0(codes, bits) if planar
        else _pack_axis0_np(codes, bits)
    )


def rt_planes_decode_jnp(qweight, K: int, block_k: int, bits: int):
    """jit-safe plane-split rt -> logical codes [K, N]."""
    import jax.numpy as jnp

    rows_t = bits * block_k // 32
    T = K // block_k
    u = qweight.reshape(T, rows_t, -1).astype(jnp.uint32)

    def unp(x, w):
        pf = 32 // w
        sh = (jnp.arange(pf, dtype=jnp.uint32) * w)[None, None, :, None]
        v = (x[:, :, None, :] >> sh) & jnp.uint32((1 << w) - 1)
        return v.reshape(x.shape[0], x.shape[1] * pf, x.shape[2])

    codes = None
    r0 = 0
    for w, off in _PLANAR_PLANES[bits]:
        rw = block_k * w // 32
        inv = jnp.asarray(np.argsort(rt_row_permutation(block_k, w, block_k)))
        part = unp(u[:, r0 : r0 + rw], w)[:, inv] << jnp.uint32(off)
        codes = part if codes is None else (codes | part)
        r0 += rw
    return codes.reshape(K, -1).astype(jnp.int32)


def repack_rt3(qweight: np.ndarray, block_k: int) -> np.ndarray:
    """3-bit stitched -> plane-split rt (see repack_rt_planes)."""
    return repack_rt_planes(qweight, 3, block_k, planar=False)


def unrepack_rt3(qweight_rt: np.ndarray, block_k: int) -> np.ndarray:
    return unrepack_rt_planes(qweight_rt, 3, block_k, planar=False)


def rt3_decode_jnp(qweight, K: int, block_k: int):
    return rt_planes_decode_jnp(qweight, K, block_k, 3)


