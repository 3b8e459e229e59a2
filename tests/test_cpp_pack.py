"""Native C++ packer vs the numpy reference — bit-exact, all layouts."""

import numpy as np
import pytest

from gptqmodel_tpu.ops import pack as P
from gptqmodel_tpu.utils.cpp import pack_ext


@pytest.mark.skipif(pack_ext() is None, reason="native ext unavailable")
@pytest.mark.parametrize("bits", [2, 4, 8])
def test_native_cont_pack_bit_exact(bits):
    rng = np.random.default_rng(bits)
    codes = rng.integers(0, 2**bits, size=(256, 64), dtype=np.uint32)
    big = np.tile(codes, (32, 128))  # above the native-path threshold
    out = P._pack_axis0_np(big, bits)  # routes to the C++ packer
    native = P._native_pack(big, bits, planar=False)
    lo = P._NATIVE_PACK_MIN_ELEMS
    try:
        P._NATIVE_PACK_MIN_ELEMS = 1 << 60  # force numpy
        ref_np = P._pack_axis0_np(big, bits)
    finally:
        P._NATIVE_PACK_MIN_ELEMS = lo
    np.testing.assert_array_equal(native, ref_np)
    np.testing.assert_array_equal(out, ref_np)


@pytest.mark.skipif(pack_ext() is None, reason="native ext unavailable")
@pytest.mark.parametrize("bits", [2, 3, 4, 5, 6, 7, 8])
def test_native_planar_pack_bit_exact(bits):
    rng = np.random.default_rng(bits)
    big = rng.integers(0, 2**bits, size=(2048, 1024), dtype=np.uint32)
    native = P._native_pack(big, bits, planar=True)
    lo = P._NATIVE_PACK_MIN_ELEMS
    try:
        P._NATIVE_PACK_MIN_ELEMS = 1 << 60
        ref = P.planar_pack_axis0(big, bits)
    finally:
        P._NATIVE_PACK_MIN_ELEMS = lo
    np.testing.assert_array_equal(native, ref)
    # unpack roundtrip through the jnp/np unpackers still holds
    np.testing.assert_array_equal(
        P.planar_unpack_axis0(native, bits), big.astype(np.int32)
    )
