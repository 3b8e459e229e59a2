"""Expert parallelism over the virtual 8-device CPU mesh.

EP must (a) actually shard the stacked expert tensors' E axis, (b) match the
single-device stacked dispatch bit-for-bit up to psum reduction order, for
both the dense and the packed stacked forms.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gptqmodel_tpu.models.spec import ModelSpec
from gptqmodel_tpu.models.transformer import moe_mlp
from gptqmodel_tpu.ops import registry
from gptqmodel_tpu.parallel.expert import shard_expert_stacks
from gptqmodel_tpu.parallel.sharding import make_mesh


def _moe_spec(E=8, D=128, F=64, topk=2):
    return ModelSpec(
        model_type="qwen3_moe", hidden_size=D, intermediate_size=F,
        num_layers=1, num_heads=4, num_kv_heads=2, head_dim=32,
        vocab_size=64, num_experts=E, num_experts_per_tok=topk,
        moe_intermediate_size=F, norm_topk_prob=True,
    )


def _dense_mp(rng, spec):
    E, D, F = spec.num_experts, spec.hidden_size, spec.moe_intermediate_size
    return {
        "gate": {"weight": rng.standard_normal((E, D)).astype(np.float32) * 0.1},
        "experts_stacked": {
            "gate": jnp.asarray(rng.standard_normal((E, D, F)).astype(np.float32) * 0.1),
            "up": jnp.asarray(rng.standard_normal((E, D, F)).astype(np.float32) * 0.1),
            "down": jnp.asarray(rng.standard_normal((E, F, D)).astype(np.float32) * 0.1),
        },
    }


def test_ep_dense_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(0)
    spec = _moe_spec()
    mp = _dense_mp(rng, spec)
    h = jnp.asarray(rng.standard_normal((2, 8, spec.hidden_size)).astype(np.float32))

    ref = np.asarray(moe_mlp(spec, mp, h))

    mesh = make_mesh({"data": 2, "expert": 4})
    mp_sharded = {"mlp": mp}
    shard_expert_stacks(spec, {"model": {"layers": [mp_sharded]}}, mesh)
    st = mp_sharded["mlp"]["experts_stacked"]
    assert not st["gate"].sharding.is_fully_replicated  # E axis actually split
    assert st["gate"].sharding.shard_shape(st["gate"].shape)[0] == 2

    registry.set_expert_parallel(mesh, "expert")
    try:
        got = np.asarray(moe_mlp(spec, mp_sharded["mlp"], h))
    finally:
        registry.set_expert_parallel(None)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_ep_packed_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from gptqmodel_tpu.ops.pallas_qmoe import stack_packed_experts
    from gptqmodel_tpu.ops.qlinear import make_quant_linear

    rng = np.random.default_rng(1)
    E, D, F, topk = 8, 256, 128, 2
    spec = _moe_spec(E=E, D=D, F=F, topk=topk)

    def ql(out_f, in_f):
        codes = rng.integers(0, 16, size=(out_f, in_f), dtype=np.int32)
        scales = rng.uniform(0.005, 0.02, size=(in_f // 128, out_f)).astype(np.float32)
        zeros = np.full((in_f // 128, out_f), 8, np.int32)
        p = make_quant_linear(Q=codes, scales=scales, zeros=zeros, g_idx=None,
                              bias=None, bits=4, group_size=128, sym=True)
        return registry.post_init_module(p)

    experts_g = [ql(F, D) for _ in range(E)]
    experts_u = [ql(F, D) for _ in range(E)]
    experts_d = [ql(D, F) for _ in range(E)]
    sq = {
        "gate": stack_packed_experts(experts_g),
        "up": stack_packed_experts(experts_u),
        "down": stack_packed_experts(experts_d),
    }
    assert all(v is not None for v in sq.values())
    mp = {
        "gate": {"weight": rng.standard_normal((E, D)).astype(np.float32) * 0.1},
        "experts_stacked_q": sq,
    }
    h = jnp.asarray(rng.standard_normal((1, 8, D)).astype(np.float32))

    registry.set_backend("pallas_interpret")  # CPU mesh: interpret the kernel
    try:
        ref = np.asarray(moe_mlp(spec, mp, h))
        mesh = make_mesh({"expert": 8})
        shard_expert_stacks(spec, {"model": {"layers": [{"mlp": mp}]}}, mesh)
        assert not sq["gate"].qweight.sharding.is_fully_replicated or \
            mp["experts_stacked_q"]["gate"].qweight.sharding is not None
        registry.set_expert_parallel(mesh, "expert")
        got = np.asarray(moe_mlp(spec, mp, h))
    finally:
        registry.set_expert_parallel(None)
        registry.set_backend("auto")
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
