"""Tensor-parallel CONTINUOUS BATCHING (r5): the pipelined engine runs
with params + KV sharded over a mesh purely by GSPMD propagation — no
engine code changes, oracle-exact outputs, cache sharding preserved
through the fused-scan carries. This extends stage-5/6 scaling
(SURVEY §7 step 6) from the batch-prefill ShardedServing to the full
production engine (spec, decode blocks, batched prefill admission)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gptqmodel_tpu.utils.testing import (
    quantize_params_rtn, random_dense_params, tiny_spec)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")


def _oracle_greedy(spec, params, prompt, steps):
    from gptqmodel_tpu.models.transformer import forward_logits

    seq = list(prompt)
    out = []
    for _ in range(steps):
        logits = np.asarray(forward_logits(
            spec, params, jnp.asarray([seq], dtype=jnp.int32)))
        nxt = int(np.argmax(logits[0, -1]))
        out.append(nxt)
        seq.append(nxt)
    return out


@pytest.mark.parametrize("spec_k,block", [(0, 1), (0, 4), (3, 2)])
def test_tp_sharded_engine_matches_oracle(spec_k, block):
    from gptqmodel_tpu.inference.scheduler import ContinuousBatchingEngine
    from gptqmodel_tpu.parallel.sharding import make_mesh, shard_params

    tp = 4
    mesh = make_mesh({"model": tp})
    spec = tiny_spec(hidden=128, layers=2, heads=8, kv_heads=4, inter=256,
                     vocab=512)
    params = quantize_params_rtn(
        random_dense_params(spec, seed=3), bits=4, group_size=32)
    rng = np.random.default_rng(0)
    base = rng.integers(1, 500, size=4)
    p1 = np.tile(base, 3).tolist()
    p2 = rng.integers(1, 500, size=17).tolist()

    params_sh = shard_params(params, mesh, strict=True)
    eng = ContinuousBatchingEngine(
        spec, params_sh, max_slots=2, max_len=96, dtype=jnp.float32,
        spec_k=spec_k, decode_block=block).shard(mesh)
    r1 = eng.submit(p1, max_new_tokens=8)
    eng.step()
    r2 = eng.submit(p2, max_new_tokens=6)
    eng.run_until_idle()
    assert r1.output_ids == _oracle_greedy(spec, params, p1, 8)
    assert r2.output_ids == _oracle_greedy(spec, params, p2, 6)
    # caches kept their head-dim sharding through the scan carries
    sh = eng.caches[0]["k"].sharding
    assert not sh.is_fully_replicated
    assert sh.spec == P(None, "model"), sh