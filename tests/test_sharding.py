"""Sharding-rule tests on the virtual 8-device CPU mesh (SURVEY §2.7)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from gptqmodel_tpu.parallel.sharding import make_mesh, param_pspecs, shard_params
from gptqmodel_tpu.utils.testing import (
    quantize_params_rtn,
    random_dense_params,
    tiny_spec,
)


def test_pspecs_dense_rules():
    spec = tiny_spec(hidden=128, layers=1, heads=8, kv_heads=4, inter=256, vocab=256)
    params = random_dense_params(spec)
    specs = param_pspecs(params)
    lp = specs["model"]["layers"][0]
    assert lp["self_attn"]["q_proj"]["weight"] == P("model", None)
    assert lp["self_attn"]["o_proj"]["weight"] == P(None, "model")
    assert lp["mlp"]["down_proj"]["weight"] == P(None, "model")
    assert lp["input_layernorm"]["weight"] == P()
    assert specs["model"]["embed_tokens"]["weight"] == P("model", None)


def test_pspecs_quant_rules():
    spec = tiny_spec(hidden=128, layers=1, heads=8, kv_heads=4, inter=256, vocab=256)
    params = quantize_params_rtn(random_dense_params(spec), bits=4, group_size=32)
    specs = param_pspecs(params)
    q = specs["model"]["layers"][0]["self_attn"]["q_proj"]
    assert q.qweight == P(None, "model")  # col-parallel: shard out lanes
    assert q.scales == P(None, "model")
    d = specs["model"]["layers"][0]["mlp"]["down_proj"]
    assert d.qweight == P("model", None)  # row-parallel: shard packed rows
    assert d.scales == P("model", None)


def test_shard_params_places_on_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh({"data": 2, "model": 4})
    spec = tiny_spec(hidden=128, layers=1, heads=8, kv_heads=4, inter=256, vocab=512)
    params = quantize_params_rtn(random_dense_params(spec), bits=4, group_size=32)
    sharded = shard_params(params, mesh)
    q = sharded["model"]["layers"][0]["self_attn"]["q_proj"]
    # qweight [in/8, out]: out lanes split over 4 model shards
    assert q.qweight.sharding.shard_shape(q.qweight.shape)[1] == q.qweight.shape[1] // 4
    # indivisible dims fall back to replication rather than erroring
    norm = sharded["model"]["layers"][0]["input_layernorm"]["weight"]
    assert norm.sharding.is_fully_replicated


def test_shard_params_preserves_runtime_meta():
    """rt-repacked (post-init) modules must keep rt_layout/rt_block_k/
    zero_const through shard_params — losing them silently corrupts the
    dequant semantics of the sharded forward."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from gptqmodel_tpu.ops.registry import post_init_params

    mesh = make_mesh({"data": 2, "model": 4})
    spec = tiny_spec(hidden=1024, layers=1, heads=8, kv_heads=4, inter=2048,
                     vocab=512)
    params = quantize_params_rtn(random_dense_params(spec), bits=4, group_size=128)
    params = post_init_params(params)
    q0 = params["model"]["layers"][0]["self_attn"]["q_proj"]
    assert q0.rt_layout and q0.rt_block_k > 0  # precondition: rt actually on
    sharded = shard_params(params, mesh)
    q1 = sharded["model"]["layers"][0]["self_attn"]["q_proj"]
    assert q1.rt_layout == q0.rt_layout
    assert q1.rt_block_k == q0.rt_block_k
    assert q1.zero_const == q0.zero_const
    # specs mirror keeps meta too
    sp = param_pspecs(params)["model"]["layers"][0]["self_attn"]["q_proj"]
    assert sp.rt_layout == q0.rt_layout and sp.rt_block_k == q0.rt_block_k
