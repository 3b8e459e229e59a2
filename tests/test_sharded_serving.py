"""TP+DP sharded serving on the virtual 8-device CPU mesh.

Sharded decode must (a) actually shard weights and KV caches, (b) produce
the same tokens as the single-device engine, (c) work across mesh layouts.
"""

import numpy as np

import jax
import jax.numpy as jnp

from gptqmodel_tpu.inference.engine import greedy_generate
from gptqmodel_tpu.ops.registry import set_attention_backend
from gptqmodel_tpu.parallel.serving import ShardedServing, scaling_report
from gptqmodel_tpu.parallel.sharding import make_mesh
from gptqmodel_tpu.utils.testing import (
    quantize_params_rtn,
    random_dense_params,
    tiny_spec,
)


def _setup(tp):
    spec = tiny_spec(
        hidden=128, layers=2, heads=2 * tp, kv_heads=tp, inter=128 * tp,
        vocab=128 * tp,
    )
    params = quantize_params_rtn(random_dense_params(spec), bits=4, group_size=64)
    return spec, params


def test_sharded_decode_matches_single_device():
    assert len(jax.devices()) >= 8
    tp = 4
    spec, params = _setup(tp)
    mesh = make_mesh({"data": 2, "model": tp})
    B, T, new = 4, 8, 6
    ids = (np.arange(B * T).reshape(B, T) % (spec.vocab_size - 1)) + 1
    lens = np.full((B,), T, np.int32)

    try:
        srv = ShardedServing(spec, params, mesh, batch=B, max_len=T + new,
                             dtype=jnp.float32)
        # weights + caches actually sharded
        q0 = srv.params["model"]["layers"][0]["self_attn"]["q_proj"]
        assert not q0.qweight.sharding.is_fully_replicated
        assert not srv.caches[0]["k"].sharding.is_fully_replicated
        got = srv.generate_greedy(ids, lens, new)
    finally:
        set_attention_backend("auto")

    ref = greedy_generate(
        spec, params, ids, lens, max_new_tokens=new, dtype=jnp.float32
    )
    np.testing.assert_array_equal(got, ref)


def test_scaling_report_mesh_layouts():
    spec, params = _setup(2)
    rows = scaling_report(
        spec, params,
        [{"data": 1, "model": 2}, {"data": 2, "model": 2},
         {"data": 4, "model": 2}],
        batch=4,
    )
    try:
        assert len(rows) == 3
        assert all(r["step_ms"] > 0 for r in rows)
    finally:
        set_attention_backend("auto")
