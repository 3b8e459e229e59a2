"""TP padding for uneven dims (VERDICT r4 #8): tp_pad_dense zero-pads
heads/intermediate so every TP-sharded dim divides the mesh axis, and the
padded QUANTIZED forward equals the unpadded one (padding is
semantics-preserving: zero q/k/v rows -> zero attention output; zero
o/down in-columns consume them; GQA query->kv mapping of real heads is
unchanged because both sides scale by the same ratio).

Reference analog: TensorParallelPadderConfig (config.py:1185) pads
in-features pre-solve for downstream TP runtimes."""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gptqmodel_tpu.parallel.sharding import (
    make_mesh, shard_params, tp_pad_dense)
from gptqmodel_tpu.utils.testing import (
    quantize_params_rtn, random_dense_params, tiny_spec)


def test_tp_pad_dense_forward_equal_and_strict_shard():
    from gptqmodel_tpu.models.transformer import forward_logits

    tp = 4
    spec = tiny_spec(hidden=96, layers=2, heads=6, kv_heads=2, inter=208,
                     vocab=512)
    dense = random_dense_params(spec, seed=5)
    q = quantize_params_rtn(copy.deepcopy(dense), bits=4, group_size=16)
    ids = jnp.asarray(np.arange(2 * 12).reshape(2, 12) % 512)
    ref = np.asarray(forward_logits(spec, q, ids, dtype=jnp.float32))

    specp, densep = tp_pad_dense(spec, dense, tp, group_size=16)
    assert (specp.num_heads, specp.num_kv_heads,
            specp.intermediate_size) == (12, 4, 256)
    qp = quantize_params_rtn(densep, bits=4, group_size=16)
    got = np.asarray(forward_logits(specp, qp, ids, dtype=jnp.float32))
    np.testing.assert_allclose(got, ref, atol=2e-4)

    # strict sharding on an 8-dev mesh: zero replication fallbacks
    if len(jax.devices()) >= 8:
        mesh = make_mesh({"data": 2, "model": tp})
        qp_sh = shard_params(qp, mesh, strict=True)  # raises on fallback
        got_sh = np.asarray(jax.jit(
            lambda p, i: forward_logits(specp, p, i, dtype=jnp.float32)
        )(qp_sh, ids))
        np.testing.assert_allclose(got_sh, ref, atol=2e-4)
        # and the UNPADDED quantized tree does fall back (the warning case)
        with pytest.raises(ValueError, match="replicated"):
            shard_params(q, mesh, strict=True)


def test_tp_pad_dense_rejects_bad_geometry():
    spec = tiny_spec(hidden=96, layers=1, heads=6, kv_heads=4, inter=64,
                     vocab=64)  # 6 % 4 != 0: non-integral GQA ratio
    dense = random_dense_params(spec, seed=1)
    with pytest.raises(ValueError, match="GQA ratio"):
        tp_pad_dense(spec, dense, 4, group_size=16)

    spec2 = tiny_spec(hidden=96, layers=1, heads=6, kv_heads=2, inter=64,
                      vocab=64)
    dense2 = random_dense_params(spec2, seed=1)
    with pytest.raises(ValueError, match="group_size"):
        # padded attention in-features 12*16=192 % (4*128) != 0
        tp_pad_dense(spec2, dense2, 4, group_size=128)
