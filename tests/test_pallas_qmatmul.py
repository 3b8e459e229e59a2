"""Pallas fused dequant-matmul vs the XLA reference path.

Model: reference kernel tests (tests/kernels/test_gptq.py) — every fast
kernel validates against the executable reference semantics across
bits × group_size sweeps. On CPU these run the kernel in interpreter mode;
the same code compiles for TPU (exercised by bench.py / __graft_entry__.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gptqmodel_tpu.ops import registry
from gptqmodel_tpu.ops.qlinear import dequantize_weight, make_quant_linear, qlinear_forward_xla


def _random_module(bits, group_size, in_f, out_f, seed=0, sym=False, pow2_scales=False):
    rng = np.random.default_rng(seed)
    g = in_f if group_size == -1 else group_size
    G = in_f // g
    codes = rng.integers(0, 2**bits, size=(out_f, in_f), dtype=np.int64)
    if pow2_scales:  # exactly representable in bf16: isolates algorithmic bugs
        scales = (2.0 ** rng.integers(-7, -4, size=(G, out_f))).astype(np.float16)
    else:
        scales = rng.uniform(0.005, 0.05, size=(G, out_f)).astype(np.float16)
    zeros = rng.integers(0, 2**bits, size=(G, out_f), dtype=np.int64)
    p = make_quant_linear(
        Q=codes, scales=scales, zeros=zeros, g_idx=None, bias=None,
        bits=bits, group_size=group_size, sym=sym,
    )
    return registry.post_init_module(p)


@pytest.mark.parametrize(
    "bits,group_size,in_f,out_f",
    [
        (4, 128, 256, 256),
        (4, 64, 256, 128),
        (4, -1, 256, 128),
        (8, 128, 256, 128),
        (2, 128, 256, 128),
        (4, 128, 512, 384),
    ],
)
def test_pallas_matches_xla(bits, group_size, in_f, out_f):
    """bf16 in-kernel dequant: relative L2 vs the f32 XLA path must be at
    bf16 rounding level (the fast kernels trade f32 dequant for speed, like
    marlin's fp16 compute path)."""
    p = _random_module(bits, group_size, in_f, out_f)
    rng = np.random.default_rng(1)
    for M in (1, 7, 16):
        x = jnp.asarray(rng.standard_normal((M, in_f)), dtype=jnp.float32)
        ref = np.asarray(qlinear_forward_xla(p, x))
        registry.set_backend("pallas_interpret")
        try:
            got = np.asarray(registry.qlinear_forward(p, x))
        finally:
            registry.set_backend("auto")
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 8e-3, (M, rel)


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_pallas_exact_with_pow2_scales(bits):
    """With power-of-two scales (bf16-exact) and integer zeros the kernel's
    dequant is exact, so any mismatch beyond f32-dot noise is an indexing /
    layout bug — this guards the plane-major permutation."""
    p = _random_module(bits, 64, 256, 128, pow2_scales=True)
    rng = np.random.default_rng(2)
    # x integers: exact in bf16, dot products exact in f32 accumulation
    x = jnp.asarray(
        rng.integers(-4, 5, size=(4, 256)).astype(np.float32), dtype=jnp.bfloat16
    )
    ref = np.asarray(qlinear_forward_xla(p, x.astype(jnp.float32)))
    ref_bf16 = np.asarray(jnp.asarray(ref, jnp.bfloat16), np.float32)  # output cast
    registry.set_backend("pallas_interpret")
    try:
        got = np.asarray(registry.qlinear_forward(p, x), dtype=np.float32)
    finally:
        registry.set_backend("auto")
    np.testing.assert_allclose(got, ref_bf16, rtol=0, atol=1e-6)


def test_pallas_bf16_activation():
    p = _random_module(4, 128, 256, 256)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((8, 256)), dtype=jnp.bfloat16)
    ref = np.asarray(qlinear_forward_xla(p, x), dtype=np.float32)
    registry.set_backend("pallas_interpret")
    try:
        got = np.asarray(registry.qlinear_forward(p, x), dtype=np.float32)
    finally:
        registry.set_backend("auto")
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-2, rel  # bf16 dequant + matmul noise only


def test_capability_contract_and_selection():
    from gptqmodel_tpu.ops import pallas_qmatmul

    # 3-bit, desc_act imports, and misaligned shapes fall back to XLA
    assert not pallas_qmatmul.supports(3, 128, 256, 256, True)
    assert not pallas_qmatmul.supports(4, 128, 256, 256, False)  # g_idx set
    assert not pallas_qmatmul.supports(4, 128, 256, 100, True)  # out % 128
    assert pallas_qmatmul.supports(4, 128, 256, 256, True)

    p3 = _random_module(3, 32, 96, 128) if False else None  # 3-bit unsupported by pallas
    p = _random_module(4, 128, 256, 256)
    assert registry.select_kernel(p) in ("xla", "pallas")  # auto, CPU -> xla
    registry.set_backend("xla")
    try:
        assert registry.select_kernel(p) == "xla"
    finally:
        registry.set_backend("auto")

    # forcing pallas on an incompatible module raises with a clear message
    bad = _random_module(4, 128, 256, 256)
    bad = registry.post_init_module(bad)
    object.__setattr__  # (dataclass not frozen; mutate g_idx directly)
    bad.g_idx = np.arange(256, dtype=np.int32)[::-1].copy()
    registry.set_backend("pallas")
    try:
        with pytest.raises(ValueError, match="does not support"):
            registry.select_kernel(bad)
    finally:
        registry.set_backend("auto")


def test_rt_repack_roundtrip():
    from gptqmodel_tpu.ops import pack as P

    rng = np.random.default_rng(0)
    for bits in (2, 4, 8):
        K, N = 2048, 128
        codes = rng.integers(0, 2**bits, size=(K, N), dtype=np.int64)
        qw = P.pack_qweight(codes, bits)
        bk = 8 * 128
        rt = P.repack_rt(qw, bits, bk)
        back = P.unrepack_rt(rt, bits, bk)
        np.testing.assert_array_equal(back, qw)
        # permutation is a bijection
        perm = P.rt_row_permutation(K, bits, bk)
        assert len(np.unique(perm)) == K


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_rt_kernel_matches_xla(bits):
    """Group-aligned rt path (auto-repacked at post_init for g%128==0,
    K%(8g)==0) vs the f32 XLA reference. The zero-point correction cancels
    in f32, so tolerance is f32-cancellation level, not exact."""
    p = _random_module(bits, 128, 1024, 256)
    assert p.rt_layout, "post_init should have repacked this shape"
    rng = np.random.default_rng(3)
    for M in (1, 8):
        x = jnp.asarray(rng.standard_normal((M, 1024)), dtype=jnp.float32)
        ref = np.asarray(qlinear_forward_xla(p, x))
        registry.set_backend("pallas_interpret")
        try:
            got = np.asarray(registry.qlinear_forward(p, x))
        finally:
            registry.set_backend("auto")
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 8e-3, (M, rel)


@pytest.mark.parametrize("bits", [4, 8])
def test_rt_sym_fast_path_matches_xla(bits):
    """Uniform zeros (sym quant) route through the zvals-free bf16-scales
    kernel variant (post_init sets zero_const); must still match XLA."""
    rng = np.random.default_rng(5)
    K, N, g = 1024, 256, 128
    codes = rng.integers(0, 2**bits, size=(N, K), dtype=np.int64)
    scales = rng.uniform(0.005, 0.05, size=(K // g, N)).astype(np.float16)
    zeros = np.full((K // g, N), 2 ** (bits - 1), np.int64)  # uniform (sym)
    p = make_quant_linear(Q=codes, scales=scales, zeros=zeros, g_idx=None,
                          bias=None, bits=bits, group_size=g, sym=True)
    p = registry.post_init_module(p)
    assert p.zero_const == float(2 ** (bits - 1))
    assert p.rt_layout
    x = jnp.asarray(rng.standard_normal((8, K)), dtype=jnp.bfloat16)
    ref = np.asarray(qlinear_forward_xla(p, x), np.float32)
    registry.set_backend("pallas_interpret")
    try:
        got = np.asarray(registry.qlinear_forward(p, x), np.float32)
    finally:
        registry.set_backend("auto")
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-2, rel  # bf16 scales add ~0.4% on top of bf16 dequant


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_rt_sym_fused_variant_matches_xla(bits, monkeypatch):
    """GPTQ_TPU_RT_FUSED=1 folds scales into the bf16 weight tile (one big
    dot per plane + rank-gpk zero correction); precision = marlin-style
    bf16-domain dequant, so same tolerance as the per-group sym kernel."""
    monkeypatch.setenv("GPTQ_TPU_RT_FUSED", "1")
    rng = np.random.default_rng(7)
    K, N, g = 2048, 256, 128
    codes = rng.integers(0, 2**bits, size=(N, K), dtype=np.int64)
    scales = rng.uniform(0.005, 0.05, size=(K // g, N)).astype(np.float16)
    zeros = np.full((K // g, N), 2 ** (bits - 1), np.int64)
    p = make_quant_linear(Q=codes, scales=scales, zeros=zeros, g_idx=None,
                          bias=None, bits=bits, group_size=g, sym=True)
    p = registry.post_init_module(p)
    assert p.rt_layout and p.zero_const == float(2 ** (bits - 1))
    x = jnp.asarray(rng.standard_normal((8, K)), dtype=jnp.bfloat16)
    ref = np.asarray(qlinear_forward_xla(p, x), np.float32)
    registry.set_backend("pallas_interpret")
    try:
        got = np.asarray(registry.qlinear_forward(p, x), np.float32)
    finally:
        registry.set_backend("auto")
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1.5e-2, rel


def test_rt_sym_fused_variant_pow2_exact(monkeypatch):
    """Power-of-two scales stay EXACT through the fused path (code*2^k and
    the zero correction are bf16-representable) — the layout guard that
    catches any unpack-order/offset regression bit-exactly."""
    monkeypatch.setenv("GPTQ_TPU_RT_FUSED", "1")
    rng = np.random.default_rng(9)
    K, N, g = 2048, 128, 128
    codes = rng.integers(0, 16, size=(N, K), dtype=np.int64)
    scales = (2.0 ** rng.integers(-8, -4, size=(K // g, N))).astype(np.float32)
    zeros = np.full((K // g, N), 8, np.int64)
    p = make_quant_linear(Q=codes, scales=scales, zeros=zeros, g_idx=None,
                          bias=None, bits=4, group_size=g, sym=True)
    p = registry.post_init_module(p)
    assert p.rt_layout
    # one-hot rows recover individual dequantized weights exactly
    x = jnp.asarray(np.eye(K, dtype=np.float32)[:8], dtype=jnp.bfloat16)
    ref = np.asarray(qlinear_forward_xla(p, x), np.float32)
    registry.set_backend("pallas_interpret")
    try:
        got = np.asarray(registry.qlinear_forward(p, x), np.float32)
    finally:
        registry.set_backend("auto")
    np.testing.assert_array_equal(got, ref)


def test_rt_layout_export_is_interchange():
    """Saving an rt-repacked module must write the interchange layout."""
    from gptqmodel_tpu.models.writer import flatten_params
    from gptqmodel_tpu.ops import pack as P

    p0 = _random_module(4, 128, 1024, 128)  # post_init -> rt
    assert p0.rt_layout
    flat = flatten_params({"m": p0}, v1_zeros=False)
    # reconstruct codes from the export and compare against dequant
    codes = P.unpack_qweight(flat["m.qweight"], 4)
    zeros = P.unpack_qzeros(flat["m.qzeros"], 4)
    w = (codes - np.repeat(zeros, 128, 0)) * np.repeat(
        np.asarray(p0.scales, np.float32), 128, 0
    )
    np.testing.assert_allclose(
        w, np.asarray(dequantize_weight(p0)), atol=1e-5
    )


def test_zvals_not_serialized():
    from gptqmodel_tpu.models.writer import flatten_params

    p = _random_module(4, 128, 256, 128)
    flat = flatten_params({"m": p})
    assert set(flat) == {"m.qweight", "m.qzeros", "m.scales", "m.g_idx"}


def test_post_init_zvals_semantics():
    """zvals are the float zero points: (codes - zvals) * scales == dequant."""
    p = _random_module(4, 64, 128, 128, sym=False)
    w_ref = np.asarray(dequantize_weight(p))
    from gptqmodel_tpu.ops.pack import unpack_qweight

    codes = unpack_qweight(np.asarray(p.qweight), 4).astype(np.float32)
    scales = np.asarray(p.scales, np.float32)
    zv = np.asarray(p.zvals)
    w2 = (codes - np.repeat(zv, 64, 0)) * np.repeat(scales, 64, 0)
    np.testing.assert_allclose(w2, w_ref, atol=1e-5)


def _sym_module(bits, K, N, g, seed=0, pow2_scales=False):
    rng = np.random.default_rng(seed)
    G = K // g
    codes = rng.integers(0, 2**bits, size=(N, K), dtype=np.int64)
    if pow2_scales:
        scales = (2.0 ** rng.integers(-7, -4, size=(G, N))).astype(np.float16)
    else:
        scales = rng.uniform(0.005, 0.05, size=(G, N)).astype(np.float16)
    zeros = np.full((G, N), 2 ** (bits - 1), np.int64)  # uniform (sym)
    p = make_quant_linear(
        Q=codes, scales=scales, zeros=zeros, g_idx=None, bias=None,
        bits=bits, group_size=g, sym=True,
    )
    return registry.post_init_module(p)


def test_rt3_repack_roundtrip():
    from gptqmodel_tpu.ops import pack as P

    rng = np.random.default_rng(7)
    K, N, bk = 2048, 128, 1024
    codes = rng.integers(0, 8, size=(K, N), dtype=np.int64)
    qw = P.pack_qweight(codes, 3)
    rt = P.repack_rt3(qw, bk)
    assert rt.shape == qw.shape  # exactly 3 bits/weight either way
    np.testing.assert_array_equal(P.unrepack_rt3(rt, bk), qw)
    np.testing.assert_array_equal(P.unrepack_rt(rt, 3, bk), qw)  # dispatch
    import jax.numpy as _jnp

    dec = np.asarray(P.rt3_decode_jnp(_jnp.asarray(rt), K, bk))
    np.testing.assert_array_equal(dec, codes)


@pytest.mark.parametrize("bits", [3, 5, 6, 7])
def test_rt_planes_kernel_matches_xla(bits):
    """Plane-split sym fast path (3 = 2+1 stitched source, 5/6/7 = planar
    gptq_p source): post_init repack + _qmm_rtp_sym_kernel vs the f32 XLA
    reference (reference lineage: exllama q3 shift tables + the gptq_p
    planar dequant zoo — one kernel serves every width here)."""
    p = _sym_module(bits, 2048, 256, 128)
    assert p.rt_layout and p.zero_const == float(2 ** (bits - 1))
    rng = np.random.default_rng(3)
    for M in (1, 8):
        x = jnp.asarray(rng.standard_normal((M, 2048)), dtype=jnp.float32)
        ref = np.asarray(qlinear_forward_xla(p, x))
        registry.set_backend("pallas_interpret")
        try:
            got = np.asarray(registry.qlinear_forward(p, x))
        finally:
            registry.set_backend("auto")
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 8e-3, (M, rel)


@pytest.mark.parametrize("bits", [3, 5, 6, 7])
def test_rt_planes_exact_with_pow2_scales(bits):
    """pow2 scales + integer activations: the distributed per-plane dots
    and 2^off multipliers are exact in f32, so the whole kernel output
    must be EXACT — guards the plane-split layout mapping."""
    p = _sym_module(bits, 2048, 128, 128, pow2_scales=True)
    assert p.rt_layout
    rng = np.random.default_rng(2)
    x = jnp.asarray(
        rng.integers(-4, 5, size=(4, 2048)).astype(np.float32)
    )
    ref = np.asarray(qlinear_forward_xla(p, x))
    registry.set_backend("pallas_interpret")
    try:
        got = np.asarray(registry.qlinear_forward(p, x), dtype=np.float32)
    finally:
        registry.set_backend("auto")
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


@pytest.mark.parametrize("bits", [3, 5, 6, 7])
def test_rt_planes_asym_kernel_matches_xla(bits):
    """Asym plane-split fast path (r4): per-group zvals ride as a kernel
    input (_qmm_rtp_kernel); post_init must repack asym planar widths too
    (session Z14 measured the old XLA fallback at 9-16 GB/s = 52x off the
    sym rt kernels; reference Marlin is sym-only — this is beyond-parity)."""
    p = _random_module(bits, 128, 2048, 256)  # random zeros -> asym
    assert p.rt_layout and p.zero_const < 0
    rng = np.random.default_rng(4)
    for M in (1, 8):
        x = jnp.asarray(rng.standard_normal((M, 2048)), dtype=jnp.float32)
        ref = np.asarray(qlinear_forward_xla(p, x))
        registry.set_backend("pallas_interpret")
        try:
            got = np.asarray(registry.qlinear_forward(p, x))
        finally:
            registry.set_backend("auto")
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 8e-3, (M, rel)


@pytest.mark.parametrize("bits", [3, 5, 6, 7])
def test_rt_planes_asym_exact_with_pow2_scales(bits):
    """pow2 scales + integer activations + integer zeros: the asym
    plane-split kernel's zero correction (X1g * (z + 128*mult)*s) is
    exact in f32 — guards the zvals-block layout mapping."""
    p = _random_module(bits, 128, 2048, 128, pow2_scales=True)
    assert p.rt_layout and p.zero_const < 0
    rng = np.random.default_rng(2)
    x = jnp.asarray(
        rng.integers(-4, 5, size=(4, 2048)).astype(np.float32)
    )
    ref = np.asarray(qlinear_forward_xla(p, x))
    registry.set_backend("pallas_interpret")
    try:
        got = np.asarray(registry.qlinear_forward(p, x), dtype=np.float32)
    finally:
        registry.set_backend("auto")
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


@pytest.mark.parametrize("bits", [3, 5, 6, 7])
def test_rt_planes_dequantize_weight_reverses_layout(bits):
    """dequantize_weight on a plane-split rt module must equal the
    pre-repack dense dequant (export/HF-dequant path correctness)."""
    rng = np.random.default_rng(9)
    K, N, g = 2048, 128, 128
    G = K // g
    codes = rng.integers(0, 2**bits, size=(N, K), dtype=np.int64)
    scales = rng.uniform(0.005, 0.05, size=(G, N)).astype(np.float16)
    zeros = np.full((G, N), 2 ** (bits - 1), np.int64)
    p0 = make_quant_linear(Q=codes, scales=scales, zeros=zeros, g_idx=None,
                           bias=None, bits=bits, group_size=g, sym=True)
    p1 = registry.post_init_module(p0)
    assert p1.rt_layout
    w0 = np.asarray(dequantize_weight(p0, dtype=jnp.float32))
    w1 = np.asarray(dequantize_weight(p1, dtype=jnp.float32))
    np.testing.assert_array_equal(w0, w1)


def test_fused_mlp_optimize_skips_plane_bits():
    """enable_fused_mlp must not repack plane-split (3/5/6/7-bit) rt
    down projections with the stitched 8-group repack (review finding:
    it corrupted the layout before qmlp_supported rejected the width)."""
    from gptqmodel_tpu.models.optimize import enable_fused_mlp
    from gptqmodel_tpu.models.spec import ModelSpec

    p_gu = _sym_module(3, 2048, 512, 128)
    p_down = _sym_module(3, 2048, 256, 128, seed=1)
    assert p_gu.rt_layout and p_down.rt_layout
    spec = ModelSpec(model_type="llama", vocab_size=128, hidden_size=2048,
                     intermediate_size=1024, num_layers=1, num_heads=4,
                     num_kv_heads=2, head_dim=64)
    params = {"model": {"layers": [
        {"mlp": {"gate_up_proj": p_gu, "down_proj": p_down}}
    ]}}
    before = np.asarray(p_down.qweight).copy()
    enable_fused_mlp(spec, params)
    after = params["model"]["layers"][0]["mlp"]["down_proj"]
    assert after is p_down or np.array_equal(np.asarray(after.qweight), before)
    assert after.rt_block_k == p_down.rt_block_k
