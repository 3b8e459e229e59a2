"""Fused quantized-MLP kernel (ops/pallas_qmlp) vs the per-projection path.

Same validation strategy as test_pallas_qmatmul: the XLA path
(qlinear_forward_xla) is the executable reference semantics; a pow2-scales
layout guard makes every rounding step identical so the comparison is
near-bit-exact, plus a realistic-random tolerance test.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gptqmodel_tpu.ops import registry
from gptqmodel_tpu.ops.pallas_qmlp import qmlp, qmlp_supported
from gptqmodel_tpu.ops.qlinear import dequantize_weight, make_quant_linear
from gptqmodel_tpu.ops.registry import post_init_module, qmlp_forward


def _mk(rng, out_f, in_f, bits=4, g=128, pow2=False):
    """Random sym QuantLinear -> post_init (rt layout, zero_const)."""
    Q = rng.integers(0, 2**bits, size=(out_f, in_f)).astype(np.int32)
    zc = 2 ** (bits - 1)
    zeros = np.full((in_f // g, out_f), zc, np.int32)
    if pow2:
        scales = 2.0 ** rng.integers(-6, -3, size=(in_f // g, out_f))
    else:
        scales = rng.uniform(0.005, 0.02, size=(in_f // g, out_f))
    p = make_quant_linear(
        Q=Q, scales=scales.astype(np.float32), zeros=zeros, g_idx=None,
        bias=None, bits=bits, group_size=g, sym=True,
        scales_dtype=np.float32,
    )
    p = post_init_module(p)
    assert p.rt_layout and p.zero_const == zc
    return p


def _fused_gu(gate, up):
    from gptqmodel_tpu.models.optimize import _concat_quant

    return _concat_quant([gate, up])


def _ref_mlp(x, gate, up, down):
    """Reference with the kernel's exact rounding chain: bf16 x and scales,
    f32 dots/act, bf16 inner."""
    xb = x.astype(jnp.bfloat16)
    wg = dequantize_weight(
        dataclasses.replace(gate, scales=gate.scales.astype(jnp.bfloat16))
    )
    wu = dequantize_weight(
        dataclasses.replace(up, scales=up.scales.astype(jnp.bfloat16))
    )
    wd = dequantize_weight(
        dataclasses.replace(down, scales=down.scales.astype(jnp.bfloat16))
    )
    g = jnp.dot(xb.astype(jnp.float32), wg, precision="highest")
    u = jnp.dot(xb.astype(jnp.float32), wu, precision="highest")
    inner = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
    return jnp.dot(
        inner.astype(jnp.float32), wd, precision="highest"
    ).astype(x.dtype)


@pytest.mark.parametrize("pow2", [True, False])
def test_qmlp_matches_reference(pow2):
    rng = np.random.default_rng(0 if pow2 else 1)
    D, F, M = 1024, 1024, 8
    gate, up = _mk(rng, F, D, pow2=pow2), _mk(rng, F, D, pow2=pow2)
    down = _mk(rng, D, F, pow2=pow2)
    gu = _fused_gu(gate, up)
    if pow2:
        x = rng.integers(-4, 5, size=(M, D)).astype(np.float32)
    else:
        x = rng.standard_normal((M, D)).astype(np.float32) * 0.5
    xj = jnp.asarray(x, jnp.bfloat16)

    y = qmlp(
        xj, gu.qweight, gu.scales, down.qweight, down.scales,
        bits=4, group_size=128, kt_gu=gu.rt_block_k,
        zc_gu=gu.zero_const, zc_d=down.zero_const, act="silu",
        interpret=True,
    )
    ref = _ref_mlp(xj, gate, up, down)
    rel = float(
        jnp.linalg.norm((y - ref).astype(jnp.float32))
        / (jnp.linalg.norm(ref.astype(jnp.float32)) + 1e-9)
    )
    # pow2 removes scale-quantization noise; the bf16 inner + f32 sum-order
    # differences bound the rest at ~bf16 ulp
    assert rel < (3e-4 if pow2 else 2e-2), rel


def test_qmlp_forward_dispatch_and_fallback():
    rng = np.random.default_rng(2)
    D, F = 1024, 2048
    gate, up = _mk(rng, F, D), _mk(rng, F, D)
    down = _mk(rng, D, F)
    gu = _fused_gu(gate, up)
    x = jnp.asarray(rng.standard_normal((8, D)) * 0.3, jnp.bfloat16)

    registry.set_backend("pallas_interpret")
    try:
        # down rt tile (16 groups for K=2048) mismatches the kernel's 8-group
        # F-tile -> ineligible until enable_fused_mlp repacks it
        assert down.rt_block_k == 2048
        assert qmlp_forward(gu, down, x, "silu") is None

        from gptqmodel_tpu.ops.pack import repack_rt, unrepack_rt

        down8 = dataclasses.replace(
            down,
            qweight=jnp.asarray(repack_rt(
                unrepack_rt(np.asarray(down.qweight), 4, down.rt_block_k),
                4, 1024,
            )),
            rt_block_k=1024,
        )
        y = qmlp_forward(gu, down8, x, "silu")
        assert y is not None
        ref = _ref_mlp(x, gate, up, down)
        rel = float(
            jnp.linalg.norm((y - ref).astype(jnp.float32))
            / jnp.linalg.norm(ref.astype(jnp.float32))
        )
        assert rel < 2e-2, rel
        # prefill-sized M falls back
        xx = jnp.asarray(rng.standard_normal((128, D)), jnp.bfloat16)
        assert qmlp_forward(gu, down8, xx, "silu") is None
    finally:
        registry.set_backend("auto")


def test_gated_mlp_uses_fused_kernel():
    """Model-path integration: gated_mlp routes to the fused kernel at decode
    shapes and matches the per-projection XLA path."""
    from gptqmodel_tpu.models.optimize import enable_fused_mlp
    from gptqmodel_tpu.models.spec import ModelSpec
    from gptqmodel_tpu.models.transformer import gated_mlp

    rng = np.random.default_rng(4)
    D, F = 1024, 2048
    gu = _fused_gu(_mk(rng, F, D), _mk(rng, F, D))
    down = _mk(rng, D, F)
    spec = ModelSpec(
        model_type="llama", vocab_size=64, hidden_size=D,
        intermediate_size=F, num_layers=1, num_heads=8, num_kv_heads=8,
        head_dim=128,
    )
    params = {"model": {"layers": [
        {"mlp": {"gate_up_proj": gu, "down_proj": down}}
    ]}}
    enable_fused_mlp(spec, params)
    mp = params["model"]["layers"][0]["mlp"]
    h = jnp.asarray(rng.standard_normal((1, 8, D)) * 0.3, jnp.bfloat16)

    registry.set_backend("xla")
    try:
        ref = gated_mlp(spec, mp, h)
        registry.set_backend("pallas_interpret")
        y = gated_mlp(spec, mp, h)
    finally:
        registry.set_backend("auto")
    assert y.shape == (1, 8, D)
    rel = float(
        jnp.linalg.norm((y - ref).astype(jnp.float32))
        / jnp.linalg.norm(ref.astype(jnp.float32))
    )
    assert rel < 2e-2, rel


def test_enable_fused_mlp_repacks_down():
    from gptqmodel_tpu.models.optimize import enable_fused_mlp
    from gptqmodel_tpu.models.spec import ModelSpec

    rng = np.random.default_rng(3)
    D, F = 1024, 2048
    gu = _fused_gu(_mk(rng, F, D), _mk(rng, F, D))
    down = _mk(rng, D, F)
    spec = ModelSpec(
        model_type="llama", vocab_size=64, hidden_size=D,
        intermediate_size=F, num_layers=1, num_heads=8, num_kv_heads=8,
        head_dim=128,
    )
    params = {"model": {"layers": [
        {"mlp": {"gate_up_proj": gu, "down_proj": down}}
    ]}}
    dq_before = np.asarray(dequantize_weight(down))
    enable_fused_mlp(spec, params)
    d2 = params["model"]["layers"][0]["mlp"]["down_proj"]
    assert d2.rt_block_k == 1024
    assert qmlp_supported(
        bits=4, group_size=128, D=D, F=F,
        gu_rt_block_k=gu.rt_block_k, d_rt_block_k=d2.rt_block_k, M=8,
    )
    # repack is semantics-preserving
    np.testing.assert_array_equal(np.asarray(dequantize_weight(d2)), dq_before)
