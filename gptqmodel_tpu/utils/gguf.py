"""Internal GGUF reader/writer + block codecs (no external gguf package).

TPU-native analog of the reference's internal GGUF support
(gptqmodel/utils/internal_gguf.py, nn_modules/qlinear/gguf.py): parse the
GGUF v2/v3 container, decode the common llama.cpp block formats, and map
llama-arch tensor names to the HF layout this framework uses.

Import paths:
- Q4_0 -> native ``QuantLinear`` **bit-exact** (it IS 4-bit group-32
  symmetric with zero-point 8 and f16 scales), served by the fused Pallas
  kernel like any GPTQ checkpoint.
- Q8_0 -> native ``QuantLinear`` (8-bit group-32, zero 128).
- Q4_K / Q6_K / F16 / BF16 / F32 -> dense weights (K-quants carry non-integer
  per-sub-block minimums that don't fit the integer-zero GPTQ form).

llama.cpp stores attn_q/attn_k with its rope row permutation; the importer
un-permutes back to the HF rotate-half layout (inverse of convert_hf_to_gguf
``permute``).

The writer emits Q4_0 / Q8_0 / F16 GGUF files from a params tree (metadata
KVs copied through on re-export so llama.cpp tooling keeps tokenizer info).
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

GGUF_MAGIC = 0x46554747  # 'GGUF' little-endian
GGUF_VERSION = 3

# GGML tensor dtypes (llama.cpp ggml.h enum)
GGML_F32 = 0
GGML_F16 = 1
GGML_Q4_0 = 2
GGML_Q8_0 = 8
GGML_Q4_K = 12
GGML_Q5_K = 13
GGML_Q6_K = 14
GGML_BF16 = 30
GGML_Q1_0 = 40  # Bonsai sign-only (reference internal_gguf.py:70)
GGML_Q1_0_G128 = 41  # prism variant, 128-elem blocks

# enumerated-but-undecoded llama.cpp types: named errors instead of KeyError
# (matches the reference's own coverage — its numpy dequant zoo raises
# NotImplementedError for these too, nn_modules/qlinear/gguf.py:667)
_KNOWN_UNSUPPORTED = {
    3: "Q4_1", 6: "Q5_0", 7: "Q5_1", 10: "Q2_K", 11: "Q3_K", 15: "Q8_K",
    16: "IQ2_XXS", 17: "IQ2_XS", 18: "IQ3_XXS", 19: "IQ1_S", 20: "IQ4_NL",
    21: "IQ3_S", 22: "IQ2_S", 23: "IQ4_XS", 24: "I8", 25: "I16", 26: "I32",
    27: "I64", 28: "F64", 29: "IQ1_M", 34: "TQ1_0", 35: "TQ2_0",
}

# metadata value types
_T_U8, _T_I8, _T_U16, _T_I16, _T_U32, _T_I32 = 0, 1, 2, 3, 4, 5
_T_F32, _T_BOOL, _T_STR, _T_ARR, _T_U64, _T_I64, _T_F64 = 6, 7, 8, 9, 10, 11, 12

_SCALAR_FMT = {
    _T_U8: "<B", _T_I8: "<b", _T_U16: "<H", _T_I16: "<h",
    _T_U32: "<I", _T_I32: "<i", _T_F32: "<f", _T_BOOL: "<?",
    _T_U64: "<Q", _T_I64: "<q", _T_F64: "<d",
}


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.off = 0

    def read(self, fmt: str):
        v = struct.unpack_from(fmt, self.buf, self.off)
        self.off += struct.calcsize(fmt)
        return v[0]

    def read_str(self) -> str:
        n = self.read("<Q")
        s = self.buf[self.off : self.off + n].decode("utf-8")
        self.off += n
        return s

    def read_value(self, t: int):
        if t in _SCALAR_FMT:
            return self.read(_SCALAR_FMT[t])
        if t == _T_STR:
            return self.read_str()
        if t == _T_ARR:
            et = self.read("<I")
            n = self.read("<Q")
            return [self.read_value(et) for _ in range(n)]
        raise ValueError(f"unknown gguf metadata type {t}")


# --------------------------------------------------------------------------
# block codecs (numpy, vectorized)
# --------------------------------------------------------------------------


def dequant_q4_0(raw: np.ndarray, n: int) -> np.ndarray:
    """Q4_0: 18-byte blocks of 32 — f16 scale d + 16 nibble bytes;
    elem j and j+16 share byte j (lo/hi nibble); v = d * (q - 8)."""
    blocks = raw.reshape(-1, 18)
    d = blocks[:, :2].copy().view(np.float16).astype(np.float32)  # [nb, 1]
    qs = blocks[:, 2:]
    lo = (qs & 0xF).astype(np.int8) - 8
    hi = (qs >> 4).astype(np.int8) - 8
    vals = np.concatenate([lo, hi], axis=1).astype(np.float32) * d
    return vals.reshape(-1)[:n]


def quant_q4_0(x: np.ndarray) -> np.ndarray:
    """Inverse: llama.cpp quantize_row_q4_0 semantics (absmax / -8)."""
    x = x.reshape(-1, 32).astype(np.float32)
    amax_i = np.argmax(np.abs(x), axis=1)
    maxv = x[np.arange(len(x)), amax_i]  # signed value with largest |.|
    d = maxv / -8.0
    inv = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 0.0)
    q = np.clip(np.round(x * inv[:, None] + 8.5 - 0.5), 0, 15).astype(np.uint8)
    qs = (q[:, :16] | (q[:, 16:] << 4)).astype(np.uint8)
    out = np.empty((len(x), 18), np.uint8)
    out[:, :2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:] = qs
    return out.reshape(-1)


def dequant_q8_0(raw: np.ndarray, n: int) -> np.ndarray:
    """Q8_0: 34-byte blocks of 32 — f16 d + 32 int8; v = d * q."""
    blocks = raw.reshape(-1, 34)
    d = blocks[:, :2].copy().view(np.float16).astype(np.float32)
    q = blocks[:, 2:].view(np.int8).astype(np.float32)
    return (q * d).reshape(-1)[:n]


def quant_q8_0(x: np.ndarray) -> np.ndarray:
    x = x.reshape(-1, 32).astype(np.float32)
    d = np.abs(x).max(axis=1) / 127.0
    inv = np.where(d > 0, 1.0 / np.where(d == 0, 1.0, d), 0.0)
    q = np.clip(np.round(x * inv[:, None]), -127, 127).astype(np.int8)
    out = np.empty((len(x), 34), np.uint8)
    out[:, :2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:] = q.view(np.uint8)
    return out.reshape(-1)


def _q4k_scales(scales: np.ndarray):
    """Unpack the 12-byte 6-bit scale/min table -> (sc [nb,8], m [nb,8])."""
    s = scales.astype(np.uint16)
    sc = np.empty((len(s), 8), np.uint16)
    m = np.empty((len(s), 8), np.uint16)
    for j in range(4):
        sc[:, j] = s[:, j] & 63
        m[:, j] = s[:, j + 4] & 63
    for j in range(4, 8):
        sc[:, j] = (s[:, j + 4] & 0xF) | ((s[:, j - 4] >> 6) << 4)
        m[:, j] = (s[:, j + 4] >> 4) | ((s[:, j] >> 6) << 4)
    return sc.astype(np.float32), m.astype(np.float32)


def dequant_q4_k(raw: np.ndarray, n: int) -> np.ndarray:
    """Q4_K: 144-byte super-blocks of 256 — d f16, dmin f16, 12B 6-bit
    scales/mins (8 sub-blocks), 128 nibble bytes; per 64-elem chunk l,
    byte 32l+i holds elems 64l+i (lo) and 64l+32+i (hi);
    v = d*sc*q - dmin*m."""
    blocks = raw.reshape(-1, 144)
    nb = len(blocks)
    d = blocks[:, :2].copy().view(np.float16).astype(np.float32)[:, 0]
    dmin = blocks[:, 2:4].copy().view(np.float16).astype(np.float32)[:, 0]
    sc, m = _q4k_scales(blocks[:, 4:16])
    qs = blocks[:, 16:]
    vals = np.empty((nb, 256), np.float32)
    for l in range(4):  # four 64-elem chunks, two sub-blocks each
        byt = qs[:, 32 * l : 32 * (l + 1)]
        vals[:, 64 * l : 64 * l + 32] = (byt & 0xF).astype(np.float32)
        vals[:, 64 * l + 32 : 64 * l + 64] = (byt >> 4).astype(np.float32)
    sub = np.repeat(np.arange(8), 32)[None, :]  # sub-block of each elem
    out = d[:, None] * np.take_along_axis(sc, sub, 1) * vals \
        - dmin[:, None] * np.take_along_axis(m, sub, 1)
    return out.reshape(-1)[:n]


def _q4k_pack_scales(sc: np.ndarray, m: np.ndarray) -> np.ndarray:
    """Inverse of _q4k_scales: (nb, 8) 6-bit scales/mins -> 12 bytes/block."""
    sc = sc.astype(np.uint16)
    m = m.astype(np.uint16)
    out = np.zeros((len(sc), 12), np.uint16)
    for j in range(4):
        out[:, j] = (sc[:, j] & 63) | ((sc[:, j + 4] >> 4) << 6)
        out[:, j + 4] = (m[:, j] & 63) | ((m[:, j + 4] >> 4) << 6)
        out[:, j + 8] = (sc[:, j + 4] & 0xF) | ((m[:, j + 4] & 0xF) << 4)
    return out.astype(np.uint8)


def quant_q4_k(x: np.ndarray) -> np.ndarray:
    """Encode Q4_K super-blocks (simplified min/max sub-block affine; the
    llama.cpp encoder adds a local search, format identical)."""
    x = x.reshape(-1, 256).astype(np.float32)
    nb = len(x)
    sub = x.reshape(nb, 8, 32)
    mn = sub.min(axis=2)
    mx = sub.max(axis=2)
    m_full = np.maximum(0.0, -mn)  # stored min term is subtractive
    s_full = np.maximum(mx + m_full, 1e-12) / 15.0
    d = np.maximum(s_full.max(axis=1), 1e-12) / 63.0
    dmin = np.maximum(m_full.max(axis=1), 1e-12) / 63.0
    sc = np.clip(np.round(s_full / d[:, None]), 0, 63)
    m = np.clip(np.round(m_full / dmin[:, None]), 0, 63)
    eff_s = np.maximum(d[:, None] * sc, 1e-12)
    eff_m = dmin[:, None] * m
    q = np.clip(
        np.round((sub + eff_m[:, :, None]) / eff_s[:, :, None]), 0, 15
    ).astype(np.uint8)
    out = np.zeros((nb, 144), np.uint8)
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:4] = dmin.astype(np.float16)[:, None].view(np.uint8)
    out[:, 4:16] = _q4k_pack_scales(sc, m)
    flat = q.reshape(nb, 256)
    for chunk in range(4):
        lo = flat[:, 64 * chunk : 64 * chunk + 32]
        hi = flat[:, 64 * chunk + 32 : 64 * chunk + 64]
        out[:, 16 + 32 * chunk : 16 + 32 * (chunk + 1)] = lo | (hi << 4)
    return out.reshape(-1)


def quant_q6_k(x: np.ndarray) -> np.ndarray:
    """Encode Q6_K super-blocks (per-16 int8 sub-scales, 6-bit codes)."""
    x = x.reshape(-1, 256).astype(np.float32)
    nb = len(x)
    sub = x.reshape(nb, 16, 16)
    a = np.abs(sub).max(axis=2)  # [nb, 16]
    s_full = np.maximum(a, 1e-12) / 31.0
    d = np.maximum(s_full.max(axis=1), 1e-12) / 127.0
    sc = np.clip(np.round(s_full / d[:, None]), 1, 127).astype(np.int8)
    eff = d[:, None] * sc.astype(np.float32)
    q = np.clip(
        np.round(sub / eff[:, :, None]) + 32, 0, 63
    ).astype(np.uint8).reshape(nb, 256)
    out = np.zeros((nb, 210), np.uint8)
    ql = np.zeros((nb, 128), np.uint8)
    qh = np.zeros((nb, 64), np.uint8)
    for half in range(2):
        b = 128 * half
        q0 = q[:, b : b + 32]
        q1 = q[:, b + 32 : b + 64]
        q2 = q[:, b + 64 : b + 96]
        q3 = q[:, b + 96 : b + 128]
        ql[:, 64 * half : 64 * half + 32] = (q0 & 0xF) | ((q2 & 0xF) << 4)
        ql[:, 64 * half + 32 : 64 * half + 64] = (q1 & 0xF) | ((q3 & 0xF) << 4)
        qh[:, 32 * half : 32 * (half + 1)] = (
            (q0 >> 4) | ((q1 >> 4) << 2) | ((q2 >> 4) << 4) | ((q3 >> 4) << 6)
        )
    out[:, :128] = ql
    out[:, 128:192] = qh
    out[:, 192:208] = sc.view(np.uint8)
    out[:, 208:210] = d.astype(np.float16)[:, None].view(np.uint8)
    return out.reshape(-1)


def dequant_q6_k(raw: np.ndarray, n: int) -> np.ndarray:
    """Q6_K: 210-byte super-blocks of 256 — ql[128], qh[64], int8 scales[16],
    d f16; q = (4-bit low) | (2-bit high << 4) - 32, v = d*sc[i/16]*q."""
    blocks = raw.reshape(-1, 210)
    nb = len(blocks)
    ql = blocks[:, :128]
    qh = blocks[:, 128:192]
    sc = blocks[:, 192:208].view(np.int8).astype(np.float32)
    d = blocks[:, 208:210].copy().view(np.float16).astype(np.float32)[:, 0]
    q = np.empty((nb, 256), np.float32)
    for half in range(2):
        lo = ql[:, 64 * half : 64 * (half + 1)]
        hi = qh[:, 32 * half : 32 * (half + 1)]
        base = 128 * half
        q[:, base : base + 32] = (
            (lo[:, :32] & 0xF) | ((hi & 3) << 4)
        ).astype(np.int8) - 32
        q[:, base + 32 : base + 64] = (
            (lo[:, 32:] & 0xF) | (((hi >> 2) & 3) << 4)
        ).astype(np.int8) - 32
        q[:, base + 64 : base + 96] = (
            (lo[:, :32] >> 4) | (((hi >> 4) & 3) << 4)
        ).astype(np.int8) - 32
        q[:, base + 96 : base + 128] = (
            (lo[:, 32:] >> 4) | (((hi >> 6) & 3) << 4)
        ).astype(np.int8) - 32
    sub = np.repeat(np.arange(16), 16)[None, :]
    return (d[:, None] * np.take_along_axis(sc, sub, 1) * q).reshape(-1)[:n]


def quant_q5_k(x: np.ndarray) -> np.ndarray:
    """Encode Q5_K super-blocks (min/max sub-block affine like quant_q4_k,
    5-bit codes; byte layout is the exact inverse of dequant_q5_k, so
    round-trips are bit-stable — export symmetry with the reference's
    internal_gguf.py:202 quantize())."""
    x = x.reshape(-1, 256).astype(np.float32)
    nb = len(x)
    sub = x.reshape(nb, 8, 32)
    mn = sub.min(axis=2)
    mx = sub.max(axis=2)
    m_full = np.maximum(0.0, -mn)  # stored min term is subtractive
    s_full = np.maximum(mx + m_full, 1e-12) / 31.0
    d = np.maximum(s_full.max(axis=1), 1e-12) / 63.0
    dmin = np.maximum(m_full.max(axis=1), 1e-12) / 63.0
    sc = np.clip(np.round(s_full / d[:, None]), 0, 63)
    m = np.clip(np.round(m_full / dmin[:, None]), 0, 63)
    eff_s = np.maximum(d[:, None] * sc, 1e-12)
    eff_m = dmin[:, None] * m
    q = np.clip(
        np.round((sub + eff_m[:, :, None]) / eff_s[:, :, None]), 0, 31
    ).astype(np.uint8)
    flat = q.reshape(nb, 256)
    out = np.zeros((nb, 176), np.uint8)
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:4] = dmin.astype(np.float16)[:, None].view(np.uint8)
    out[:, 4:16] = _q4k_pack_scales(sc, m)
    qh = np.zeros((nb, 32), np.uint8)
    for j in range(8):  # fifth bit: elem 32j+i -> bit j of qh byte i
        qh |= (((flat[:, 32 * j : 32 * (j + 1)] >> 4) & 1) << j).astype(
            np.uint8)
    out[:, 16:48] = qh
    lo4 = flat & 0xF
    for chunk in range(4):  # nibble layout shared with Q4_K
        lo = lo4[:, 64 * chunk : 64 * chunk + 32]
        hi = lo4[:, 64 * chunk + 32 : 64 * chunk + 64]
        out[:, 48 + 32 * chunk : 48 + 32 * (chunk + 1)] = lo | (hi << 4)
    return out.reshape(-1)


def dequant_q5_k(raw: np.ndarray, n: int) -> np.ndarray:
    """Q5_K: 176-byte super-blocks of 256 — d f16, dmin f16, 12B 6-bit
    scales/mins (8 sub-blocks of 32), qh[32] (5th bits), 128 nibble bytes.
    Nibble layout matches Q4_K (chunk l: byte 32l+i -> elems 64l+i lo /
    64l+32+i hi); qh bit j of byte i -> elem 32j+i. v = d*sc*q - dmin*m
    (reference nn_modules/qlinear/gguf.py:577 _dequantize_q5_k_numpy)."""
    blocks = raw.reshape(-1, 176)
    nb = len(blocks)
    d = blocks[:, :2].copy().view(np.float16).astype(np.float32)[:, 0]
    dmin = blocks[:, 2:4].copy().view(np.float16).astype(np.float32)[:, 0]
    sc, m = _q4k_scales(blocks[:, 4:16])
    qh = blocks[:, 16:48]
    qs = blocks[:, 48:]
    vals = np.empty((nb, 256), np.float32)
    for l in range(4):
        byt = qs[:, 32 * l : 32 * (l + 1)]
        vals[:, 64 * l : 64 * l + 32] = (byt & 0xF).astype(np.float32)
        vals[:, 64 * l + 32 : 64 * l + 64] = (byt >> 4).astype(np.float32)
    for j in range(8):  # fifth bit per 32-elem sub-block
        hi = ((qh >> j) & 1).astype(np.float32) * 16.0
        vals[:, 32 * j : 32 * (j + 1)] += hi
    sub = np.repeat(np.arange(8), 32)[None, :]
    out = d[:, None] * np.take_along_axis(sc, sub, 1) * vals \
        - dmin[:, None] * np.take_along_axis(m, sub, 1)
    return out.reshape(-1)[:n]


def dequant_q1_0(raw: np.ndarray, n: int, block: int = 32) -> np.ndarray:
    """Bonsai sign-only Q1_0 (reference _dequantize_sign_only_numpy,
    nn_modules/qlinear/gguf.py:449): f16 scale + block/8 sign bytes per
    block; bit==1 -> +scale, bit==0 -> -scale, little bit order."""
    bb = 2 + block // 8
    blocks = raw.reshape(-1, bb)
    scales = blocks[:, :2].copy().view(np.float16).astype(np.float32)[:, 0]
    bits = np.unpackbits(blocks[:, 2:], axis=-1, bitorder="little")
    out = np.where(bits == 1, scales[:, None], -scales[:, None])
    return out.astype(np.float32).reshape(-1)[:n]


def quant_q1_0(x: np.ndarray, block: int = 32) -> np.ndarray:
    """Encode sign-only blocks: scale = mean |x| per block, signs = x >= 0."""
    x = x.reshape(-1, block).astype(np.float32)
    scales = np.abs(x).mean(axis=1).astype(np.float16)
    signs = np.packbits((x >= 0).astype(np.uint8), axis=-1, bitorder="little")
    return np.concatenate(
        [scales[:, None].view(np.uint8), signs], axis=1
    ).reshape(-1)


_BLOCK = {  # ggml dtype -> (block elems, block bytes, dequant fn)
    GGML_Q4_0: (32, 18, dequant_q4_0),
    GGML_Q8_0: (32, 34, dequant_q8_0),
    GGML_Q4_K: (256, 144, dequant_q4_k),
    GGML_Q5_K: (256, 176, dequant_q5_k),
    GGML_Q6_K: (256, 210, dequant_q6_k),
    GGML_Q1_0: (32, 6, dequant_q1_0),
    GGML_Q1_0_G128: (128, 18, lambda raw, n: dequant_q1_0(raw, n, block=128)),
}


def tensor_nbytes(ggml_type: int, n_elems: int) -> int:
    if ggml_type == GGML_F32:
        return 4 * n_elems
    if ggml_type in (GGML_F16, GGML_BF16):
        return 2 * n_elems
    if ggml_type in _KNOWN_UNSUPPORTED:
        raise NotImplementedError(
            f"GGUF type {_KNOWN_UNSUPPORTED[ggml_type]} ({ggml_type}) is not "
            "decoded (same coverage as the reference's numpy dequant zoo); "
            f"supported: Q4_0/Q8_0/Q4_K/Q5_K/Q6_K/Q1_0/Q1_0_g128/F16/BF16/F32"
        )
    if ggml_type not in _BLOCK:
        raise NotImplementedError(f"unknown GGUF tensor type id {ggml_type}")
    be, bb, _ = _BLOCK[ggml_type]
    assert n_elems % be == 0, (n_elems, be)
    return n_elems // be * bb


# --------------------------------------------------------------------------
# container
# --------------------------------------------------------------------------


class GGUFFile:
    """Parsed GGUF: ``metadata`` dict + lazy tensor access."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        buf = self.path.read_bytes()
        r = _Reader(buf)
        magic = r.read("<I")
        assert magic == GGUF_MAGIC, f"not a GGUF file: magic={magic:#x}"
        self.version = r.read("<I")
        assert self.version in (2, 3), self.version
        n_tensors = r.read("<Q")
        n_kv = r.read("<Q")
        self.metadata: dict = {}
        for _ in range(n_kv):
            key = r.read_str()
            t = r.read("<I")
            self.metadata[key] = r.read_value(t)
        self.tensors: dict[str, tuple] = {}  # name -> (shape, ggml_type, off)
        for _ in range(n_tensors):
            name = r.read_str()
            nd = r.read("<I")
            dims = [r.read("<Q") for _ in range(nd)]
            ttype = r.read("<I")
            off = r.read("<Q")
            # GGML dims are fastest-first; numpy shape is the reverse
            self.tensors[name] = (tuple(reversed(dims)), ttype, off)
        align = self.metadata.get("general.alignment", 32)
        self.data_start = (r.off + align - 1) // align * align
        self._buf = buf

    def names(self):
        return self.tensors.keys()

    def raw(self, name: str) -> np.ndarray:
        shape, ttype, off = self.tensors[name]
        n = int(np.prod(shape))
        nbytes = tensor_nbytes(ttype, n)
        start = self.data_start + off
        return np.frombuffer(self._buf, np.uint8, nbytes, start)

    def get(self, name: str, dtype=np.float32) -> np.ndarray:
        """Dequantize/convert to a dense array in numpy layout."""
        shape, ttype, _ = self.tensors[name]
        raw = self.raw(name)
        n = int(np.prod(shape))
        if ttype == GGML_F32:
            return raw.view(np.float32).reshape(shape).astype(dtype)
        if ttype == GGML_F16:
            return raw.view(np.float16).reshape(shape).astype(dtype)
        if ttype == GGML_BF16:
            import ml_dtypes

            return raw.view(ml_dtypes.bfloat16).reshape(shape).astype(dtype)
        _, _, fn = _BLOCK[ttype]
        return fn(raw, n).reshape(shape).astype(dtype)


def _write_value(out: bytearray, t: int, v):
    if t in _SCALAR_FMT:
        out += struct.pack(_SCALAR_FMT[t], v)
    elif t == _T_STR:
        b = v.encode("utf-8")
        out += struct.pack("<Q", len(b)) + b
    else:
        raise ValueError(t)


def _kv_type(v):
    if isinstance(v, bool):
        return _T_BOOL
    if isinstance(v, int):
        return _T_I64 if v < 0 else _T_U64 if v > 2**31 - 1 else _T_U32
    if isinstance(v, float):
        return _T_F32
    if isinstance(v, str):
        return _T_STR
    raise ValueError(f"unsupported metadata value {type(v)}")


def write_gguf(
    path: str | Path,
    tensors: dict[str, tuple[np.ndarray | bytes, tuple, int]],
    metadata: dict,
    alignment: int = 32,
):
    """Write a GGUF v3 file. ``tensors``: name -> (raw_bytes, shape, ggml_type)
    with raw bytes already in block format; shape in numpy order."""
    out = bytearray()
    out += struct.pack("<IIQQ", GGUF_MAGIC, GGUF_VERSION, len(tensors), len(metadata))
    for k, v in metadata.items():
        b = k.encode("utf-8")
        out += struct.pack("<Q", len(b)) + b
        if isinstance(v, list):
            out += struct.pack("<I", _T_ARR)
            et = _kv_type(v[0]) if v else _T_U32
            out += struct.pack("<IQ", et, len(v))
            for e in v:
                _write_value(out, et, e)
        else:
            t = _kv_type(v)
            out += struct.pack("<I", t)
            _write_value(out, t, v)
    offs = {}
    off = 0
    for name, (raw, shape, ttype) in tensors.items():
        b = name.encode("utf-8")
        out += struct.pack("<Q", len(b)) + b
        dims = tuple(reversed(shape))
        out += struct.pack("<I", len(dims))
        for dd in dims:
            out += struct.pack("<Q", dd)
        out += struct.pack("<IQ", ttype, off)
        offs[name] = off
        nb = len(raw)
        off += (nb + alignment - 1) // alignment * alignment
    data_start = (len(out) + alignment - 1) // alignment * alignment
    out += b"\x00" * (data_start - len(out))
    for name, (raw, shape, ttype) in tensors.items():
        raw = bytes(raw)
        out += raw
        pad = (len(raw) + alignment - 1) // alignment * alignment - len(raw)
        out += b"\x00" * pad
    Path(path).write_bytes(bytes(out))
