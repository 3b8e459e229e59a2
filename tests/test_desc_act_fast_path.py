"""desc_act (g_idx) fast inference path: act-order checkpoints run the rt
Pallas kernel via a baked-in row permutation + one activation-column gather
(reference analog: exllamav2/cuda/q_matrix.cu builds the perm at load;
marlin.py:246-261 repacks with g_idx). The XLA g_idx path stays the oracle.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gptqmodel_tpu.ops import registry
from gptqmodel_tpu.ops.qlinear import (
    QuantLinear,
    dequantize_weight,
    make_quant_linear,
    qlinear_forward_xla,
)


def _desc_act_module(bits=4, group_size=128, in_f=1024, out_f=256, seed=0,
                     sym=True, pow2_scales=False):
    """A module whose g_idx is a genuine act-order permutation."""
    rng = np.random.default_rng(seed)
    g = in_f if group_size == -1 else group_size
    G = in_f // g
    codes = rng.integers(0, 2**bits, size=(out_f, in_f), dtype=np.int64)
    if pow2_scales:
        scales = (2.0 ** rng.integers(-7, -4, size=(G, out_f))).astype(np.float16)
    else:
        scales = rng.uniform(0.005, 0.05, size=(G, out_f)).astype(np.float16)
    zeros = rng.integers(0, 2**bits, size=(G, out_f), dtype=np.int64)
    # act-order: columns permuted, each keeps its original group
    perm = rng.permutation(in_f)
    g_idx = (np.arange(in_f) // g)[np.argsort(perm)].astype(np.int32)
    p = make_quant_linear(
        Q=codes, scales=scales, zeros=zeros, g_idx=g_idx, bias=None,
        bits=bits, group_size=group_size, sym=sym,
    )
    assert p.g_idx is not None  # non-trivial permutation survives
    return p


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_post_init_builds_act_perm(bits):
    p = _desc_act_module(bits=bits)
    q = registry.post_init_module(p)
    assert q.act_perm is not None
    assert q.rt_layout
    assert q.g_idx is not None  # interchange field kept for export
    # kernel eligibility now holds
    assert registry.select_kernel(q) in ("pallas", "xla")  # no raise


@pytest.mark.parametrize("bits", [2, 4, 8])
@pytest.mark.parametrize("sym", [True, False])
def test_desc_act_pallas_matches_xla(bits, sym):
    p = _desc_act_module(bits=bits, sym=sym, seed=3)
    oracle = qlinear_forward_xla  # consumes g_idx natively, pre-post-init
    q = registry.post_init_module(p)
    rng = np.random.default_rng(1)
    for M in (1, 8):
        x = jnp.asarray(rng.standard_normal((M, p.in_features)), jnp.float32)
        ref = np.asarray(oracle(p, x))
        registry.set_backend("pallas_interpret")
        try:
            got = np.asarray(registry.qlinear_forward(q, x))
        finally:
            registry.set_backend("auto")
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 8e-3, (M, rel)


def test_desc_act_pow2_exact():
    """pow2 scales + integer activations: any mismatch is a layout bug in
    the perm-baked repack (same guard style as the rt layout tests)."""
    p = _desc_act_module(bits=4, pow2_scales=True, seed=5)
    q = registry.post_init_module(p)
    rng = np.random.default_rng(2)
    x = jnp.asarray(
        rng.integers(-4, 5, size=(4, p.in_features)).astype(np.float32),
        dtype=jnp.bfloat16,
    )
    ref = np.asarray(qlinear_forward_xla(p, x.astype(jnp.float32)))
    ref_bf16 = np.asarray(jnp.asarray(ref, jnp.bfloat16), np.float32)
    registry.set_backend("pallas_interpret")
    try:
        got = np.asarray(registry.qlinear_forward(q, x), dtype=np.float32)
    finally:
        registry.set_backend("auto")
    np.testing.assert_allclose(got, ref_bf16, rtol=0, atol=1e-6)


def test_desc_act_dequant_reversal():
    """dequantize_weight on the post-init module must equal the plain one."""
    p = _desc_act_module(seed=7)
    q = registry.post_init_module(p)
    w_ref = np.asarray(dequantize_weight(p))
    w_got = np.asarray(dequantize_weight(q))
    np.testing.assert_array_equal(w_got, w_ref)


def test_desc_act_export_roundtrip():
    """Writer must reverse both the rt repack and the act perm — exported
    qweight bytes identical before/after post_init; act_perm never leaks."""
    from gptqmodel_tpu.models.writer import flatten_params

    p = _desc_act_module(seed=9)
    q = registry.post_init_module(p)
    before = flatten_params(p, "m", {}, v1_zeros=False, conv1d_suffixes=())
    after = flatten_params(q, "m", {}, v1_zeros=False, conv1d_suffixes=())
    assert set(before) == set(after)
    for k in before:
        np.testing.assert_array_equal(before[k], after[k])
    assert not any("act_perm" in k for k in after)


def test_desc_act_fusion_shares_perm():
    """q/k/v-style fusion: identical g_idx across members fuses into one
    wide module carrying a single act_perm; forward matches per-module."""
    from gptqmodel_tpu.models.optimize import _can_fuse, _concat_quant

    a = _desc_act_module(seed=11, out_f=128)
    b = _desc_act_module(seed=12, out_f=128)
    # same activation stats -> same g_idx
    b = QuantLinear(
        qweight=b.qweight, qzeros=b.qzeros, scales=b.scales,
        g_idx=np.asarray(a.g_idx).copy(), bias=None,
        bits=b.bits, group_size=b.group_size, in_features=b.in_features,
        out_features=b.out_features, sym=b.sym, v1=b.v1,
    )
    qa, qb = registry.post_init_module(a), registry.post_init_module(b)
    assert _can_fuse([qa, qb])
    fused = _concat_quant([qa, qb])
    assert fused.act_perm is not None
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((8, a.in_features)), jnp.float32)
    registry.set_backend("pallas_interpret")
    try:
        y_f = np.asarray(registry.qlinear_forward(fused, x))
        y_a = np.asarray(registry.qlinear_forward(qa, x))
        y_b = np.asarray(registry.qlinear_forward(qb, x))
    finally:
        registry.set_backend("auto")
    np.testing.assert_allclose(y_f, np.concatenate([y_a, y_b], axis=-1),
                               rtol=1e-6, atol=1e-6)


def test_mismatched_perm_blocks_fusion():
    from gptqmodel_tpu.models.optimize import _can_fuse

    a = registry.post_init_module(_desc_act_module(seed=13, out_f=128))
    b = registry.post_init_module(_desc_act_module(seed=14, out_f=128))
    assert not _can_fuse([a, b])


def test_ragged_g_idx_stays_on_xla():
    """A custom (non-balanced) g_idx must NOT take the perm path."""
    in_f, out_f, g = 256, 128, 128
    rng = np.random.default_rng(15)
    codes = rng.integers(0, 16, size=(out_f, in_f), dtype=np.int64)
    scales = rng.uniform(0.005, 0.05, size=(2, out_f)).astype(np.float16)
    zeros = rng.integers(0, 16, size=(2, out_f), dtype=np.int64)
    g_idx = np.zeros(in_f, np.int32)
    g_idx[: in_f // 4] = 1  # unbalanced groups
    p = make_quant_linear(
        Q=codes, scales=scales, zeros=zeros, g_idx=g_idx, bias=None,
        bits=4, group_size=g, sym=False,
    )
    q = registry.post_init_module(p)
    assert q.act_perm is None and not q.rt_layout
    assert registry.select_kernel(q) == "xla"
