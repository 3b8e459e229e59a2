"""Sharded serving: tensor+data-parallel inference over a device mesh.

The reference delegates multi-GPU serving to vLLM (utils/vllm.py); here the
engine itself runs SPMD (SURVEY §7 step 6 "scale-out" — new design work):

- weights: TP via ``sharding.shard_params`` (column/row-parallel per module;
  GSPMD inserts the row-parallel all-reduce on ICI),
- KV caches: batch on the ``data`` axis, kv-heads on the ``model`` axis —
  attention is head-parallel, so decode needs NO collective beyond the
  row-parallel o_proj/down_proj reduce,
- tokens/logits: batch on ``data``.

The same code drives one host (mesh over local chips) or multi-host (mesh
over ``jax.distributed`` global devices; DCN only crosses hosts on the
``data`` axis if the mesh is laid out [data=hosts, model=local-chips]).

The fused decode-attention Pallas kernel is per-shard-capable only through
shard_map (future work); sharded serving pins the attention backend to the
XLA path, which GSPMD partitions across heads automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gptqmodel_tpu.models.spec import ModelSpec
from gptqmodel_tpu.parallel.sharding import shard_params


def kv_cache_shardings(
    mesh: Mesh, kv_quant: bool = False,
    data_axis: str = "data", model_axis: str = "model",
) -> dict:
    """Sharding for each KV-cache field: [B, Hkv, L, D] -> (data, model)."""
    full = NamedSharding(mesh, P(data_axis, model_axis, None, None))
    scal = NamedSharding(mesh, P(data_axis, model_axis, None))
    out = {"k": full, "v": full, "pos": NamedSharding(mesh, P())}
    if kv_quant:
        out["k_s"] = scal
        out["v_s"] = scal
    return out


class ShardedServing:
    """TP+DP prefill/decode over a mesh (one jit each; reused every step)."""

    def __init__(
        self,
        spec: ModelSpec,
        params,
        mesh: Mesh,
        batch: int,
        max_len: int,
        dtype=jnp.bfloat16,
        kv_quant: bool = False,
        data_axis: str = "data",
        model_axis: str = "model",
    ):
        from gptqmodel_tpu.inference.engine import (
            init_kv_cache,
            make_decode_fn,
            make_prefill_fn,
        )
        from gptqmodel_tpu.ops.registry import set_attention_backend

        assert batch % mesh.shape[data_axis] == 0, (
            f"batch {batch} must divide data axis {mesh.shape[data_axis]}"
        )
        assert spec.num_kv_heads % mesh.shape[model_axis] == 0, (
            f"kv heads {spec.num_kv_heads} must divide model axis "
            f"{mesh.shape[model_axis]}"
        )
        self.spec, self.mesh = spec, mesh
        self.data_axis = data_axis
        set_attention_backend("xla")  # see module docstring
        self.params = shard_params(params, mesh, model_axis=model_axis)
        kv_sh = kv_cache_shardings(mesh, kv_quant, data_axis, model_axis)
        self.caches = [
            {k: jax.device_put(v, kv_sh[k]) for k, v in c.items()}
            for c in init_kv_cache(spec, batch, max_len, dtype, kv_quant)
        ]
        self.key_valid = None
        self._data_sh = NamedSharding(mesh, P(data_axis))
        self._data2_sh = NamedSharding(mesh, P(data_axis, None))
        self._prefill = make_prefill_fn(spec, dtype)
        self._decode = make_decode_fn(spec, dtype)
        self._T = None

    def prefill(self, input_ids: np.ndarray, prompt_lens: np.ndarray):
        ids = jax.device_put(jnp.asarray(input_ids, jnp.int32), self._data2_sh)
        lens = jax.device_put(jnp.asarray(prompt_lens, jnp.int32), self._data_sh)
        logits, self.caches, self.key_valid = self._prefill(
            self.params, ids, lens, self.caches
        )
        self._T = input_ids.shape[1]
        self._pos = lens
        return logits

    def decode(self, token, step: int):
        logits, self.caches, self.key_valid = self._decode(
            self.params, token, self._pos, jnp.int32(self._T + step),
            self.key_valid, self.caches,
        )
        self._pos = self._pos + 1
        return logits

    def generate_greedy(self, input_ids, prompt_lens, max_new_tokens: int):
        logits = self.prefill(input_ids, prompt_lens)
        tok = jnp.argmax(logits, axis=-1)
        out = [np.asarray(tok)]
        for s in range(max_new_tokens - 1):
            logits = self.decode(tok, s)
            tok = jnp.argmax(logits, axis=-1)
            out.append(np.asarray(tok))
        return np.stack(out, axis=1)


def scaling_report(
    spec: ModelSpec,
    params,
    mesh_shapes: list[dict],
    batch: int = 8,
    T: int = 16,
    max_len: int = 32,
    steps: int = 4,
    dtype=jnp.float32,
) -> list[dict]:
    """Compile + run the sharded decode across mesh layouts; returns wall
    times. On a virtual CPU mesh this validates the sharding (the driver's
    dryrun path); on real multi-chip hardware it is the scaling-efficiency
    benchmark (BASELINE 2-host target)."""
    import time

    from gptqmodel_tpu.parallel.sharding import make_mesh

    rows = []
    ids = np.ones((batch, T), np.int32)
    lens = np.full((batch,), T, np.int32)
    for shape in mesh_shapes:
        mesh = make_mesh(shape)
        srv = ShardedServing(spec, params, mesh, batch, max_len, dtype)
        srv.prefill(ids, lens)
        tok = jnp.zeros((batch,), jnp.int32)
        srv.decode(tok, 0)  # compile
        t0 = time.perf_counter()
        for s in range(1, steps + 1):
            srv.decode(tok, s).block_until_ready()
        dt = (time.perf_counter() - t0) / steps
        rows.append({"mesh": dict(shape), "step_ms": round(dt * 1e3, 3)})
    return rows
