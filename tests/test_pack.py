"""Pack-format tests: bit-exact GPTQ v1/v2 interchange.

Model: reference pack/format tests (tests/test_pack*.py, test_asym_gptq_v1.py)
— roundtrip across bits, v1 zeros quirk, 3-bit stitch, plus an independent
scalar bit-stream oracle for the 2/4/8-bit layout.
"""

import numpy as np
import pytest

from gptqmodel_tpu.ops import pack as P
from gptqmodel_tpu.ops.qlinear import dequantize_weight, make_quant_linear, qlinear_forward_xla

import jax.numpy as jnp


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_qweight_roundtrip(bits):
    rng = np.random.default_rng(0)
    in_f, out_f = 96, 64
    codes = rng.integers(0, 2**bits, size=(in_f, out_f), dtype=np.int64)
    qw = P.pack_qweight(codes, bits)
    assert qw.dtype == np.int32
    assert qw.shape == (in_f * bits // 32, out_f)
    back = P.unpack_qweight(qw, bits)
    np.testing.assert_array_equal(back, codes)
    # jnp twin matches numpy
    back_j = np.asarray(P.unpack_qweight_jnp(jnp.asarray(qw), bits))
    np.testing.assert_array_equal(back_j, codes)


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_qweight_scalar_oracle(bits):
    """Independent oracle: word r, bit-field j holds code for row r*pf+j."""
    rng = np.random.default_rng(1)
    pf = 32 // bits
    codes = rng.integers(0, 2**bits, size=(pf * 3, 8), dtype=np.int64)
    qw = P.pack_qweight(codes, bits).view(np.uint32)
    for r in range(qw.shape[0]):
        for o in range(qw.shape[1]):
            for j in range(pf):
                expect = codes[r * pf + j, o]
                got = (int(qw[r, o]) >> (bits * j)) & (2**bits - 1)
                assert got == expect


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
@pytest.mark.parametrize("v1", [False, True])
def test_qzeros_roundtrip(bits, v1):
    rng = np.random.default_rng(2)
    zeros = rng.integers(0, 2**bits, size=(6, 96), dtype=np.int64)
    qz = P.pack_qzeros(zeros, bits, v1=v1)
    back = P.unpack_qzeros(qz, bits, v1=v1)
    # v1 storage wraps (z-1) mod 2^bits; +1 mod 2^bits restores exactly
    np.testing.assert_array_equal(back, zeros & (2**bits - 1))
    back_j = np.asarray(P.unpack_qzeros_jnp(jnp.asarray(qz), bits, v1=v1))
    np.testing.assert_array_equal(back_j, zeros & (2**bits - 1))


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_v1_v2_packed_conversion(bits):
    rng = np.random.default_rng(3)
    zeros = rng.integers(0, 2**bits, size=(4, 96), dtype=np.int64)
    qz_v2 = P.pack_qzeros(zeros, bits, v1=False)
    qz_v1 = P.pack_qzeros(zeros, bits, v1=True)
    np.testing.assert_array_equal(P.convert_qzeros_v1_to_v2(qz_v1, bits), qz_v2)
    np.testing.assert_array_equal(P.convert_qzeros_v2_to_v1(qz_v2, bits), qz_v1)


@pytest.mark.parametrize("bits,group_size", [(4, 32), (4, -1), (3, 32), (8, 64), (2, 32)])
@pytest.mark.parametrize("desc_act", [False, True])
def test_quant_linear_dequant_matches_dense(bits, group_size, desc_act):
    """Pack random (codes, scales, zeros) -> QuantLinear -> dequant == direct."""
    rng = np.random.default_rng(4)
    in_f, out_f = 128, 64
    g = in_f if group_size == -1 else group_size
    G = in_f // g
    codes = rng.integers(0, 2**bits, size=(out_f, in_f), dtype=np.int64)
    scales = rng.uniform(0.01, 0.2, size=(G, out_f)).astype(np.float16)
    zeros = rng.integers(0, 2**bits, size=(G, out_f), dtype=np.int64)
    if desc_act:
        perm = rng.permutation(in_f)
        g_idx = (np.arange(in_f) // g)[np.argsort(perm)].astype(np.int32)
    else:
        g_idx = (np.arange(in_f) // g).astype(np.int32)

    p = make_quant_linear(
        Q=codes, scales=scales, zeros=zeros, g_idx=g_idx, bias=None,
        bits=bits, group_size=group_size, sym=False,
    )
    if not desc_act:
        assert p.g_idx is None  # contiguous fast path kicks in

    w_ref = scales.astype(np.float32)[g_idx] * (codes.T - zeros[g_idx])
    w = np.asarray(dequantize_weight(p))
    np.testing.assert_allclose(w, w_ref, rtol=0, atol=0)

    x = rng.standard_normal((5, in_f)).astype(np.float32)
    y = np.asarray(qlinear_forward_xla(p, jnp.asarray(x)))
    np.testing.assert_allclose(y, x @ w_ref, rtol=1e-4, atol=1e-3)


def test_v1_checkpoint_import_semantics():
    """v1 qzeros (-1 on disk) dequant == v2 dequant of the same true zeros."""
    rng = np.random.default_rng(5)
    bits, in_f, out_f, g = 4, 64, 32, 32
    G = in_f // g
    codes = rng.integers(0, 16, size=(out_f, in_f), dtype=np.int64)
    scales = rng.uniform(0.01, 0.2, size=(G, out_f)).astype(np.float16)
    zeros = rng.integers(1, 16, size=(G, out_f), dtype=np.int64)

    kw = dict(Q=codes, scales=scales, zeros=zeros, g_idx=None, bias=None,
              bits=bits, group_size=g, sym=False)
    p_v2 = make_quant_linear(**kw, v1=False)
    p_v1 = make_quant_linear(**kw, v1=True)
    np.testing.assert_array_equal(
        np.asarray(dequantize_weight(p_v1)), np.asarray(dequantize_weight(p_v2))
    )
