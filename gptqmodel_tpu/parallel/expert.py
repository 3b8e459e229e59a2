"""Expert parallelism (EP): stacked MoE expert weights sharded over a named
mesh axis.

The reference hands multi-GPU MoE serving to vLLM; the TPU-native design
shards the stacked expert tensors' leading E axis over an ``expert`` mesh
axis and runs the MoE block under ``shard_map``: tokens are replicated,
each shard computes the ragged dispatch for its LOCAL experts only (routing
weights for remote experts masked to zero), and one ``psum`` over the
expert axis combines the partial outputs — top-k expert outputs are a sum,
so the combine is exactly a reduction riding ICI. Weight memory per chip
drops E/ep-fold, which is what makes >100-expert MoEs (qwen3-30B, BASELINE
stage 4) fit at all.

Works for both stacked forms produced by ``optimize.stack_moe_experts``:
dense ``experts_stacked`` ([E, D, F] bf16) and packed ``experts_stacked_q``
(StackedQuantExperts, grouped dequant-GEMM kernel inside the shard).

Usage: ``params = shard_expert_stacks(spec, params, mesh)`` then
``registry.set_expert_parallel(mesh, "expert")`` — ``moe_mlp`` picks the EP
path up from the registry context (same pattern as the attention-backend
pin).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_expert_stacks(spec, params, mesh: Mesh, axis: str = "expert"):
    """device_put every stacked expert tensor with its E axis on ``axis``
    (everything reached here has leading dim E). Router/shared-expert/dense
    weights are left as placed by shard_params. Returns the params tree."""
    from gptqmodel_tpu.models.transformer import model_layers

    ep = mesh.shape[axis]
    sh = NamedSharding(mesh, P(axis))

    def put_stack(st):
        return jax.tree.map(
            lambda a: jax.device_put(a, sh) if a.shape[0] % ep == 0 else a, st
        )

    for lp in model_layers(spec, params):
        for key in ("mlp", "block_sparse_moe", "feed_forward"):
            mp = lp.get(key)
            if not isinstance(mp, dict):
                continue
            for skey in ("experts_stacked", "experts_stacked_q"):
                if skey in mp:
                    mp[skey] = put_stack(mp[skey])
    return params


def moe_forward_ep(spec, stacked, x, top_w, top_i, mesh: Mesh, axis: str,
                   packed: bool):
    """EP MoE dispatch: shard_map over ``axis``; each shard runs the normal
    ragged apply on its local expert slice with remote routing weights
    zeroed, then psum. Exact (modulo float reduction order) vs the
    single-device path."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from gptqmodel_tpu.models.transformer import (
        _moe_ragged_apply, _moe_ragged_apply_q,
    )

    ep = mesh.shape[axis]
    st_specs = jax.tree.map(lambda _: P(axis), stacked)
    rep = P()

    def local(st, x, top_w, top_i):
        i = jax.lax.axis_index(axis)
        first = st.get("gateup") or st["gate"]
        E_loc = (first.qweight if packed else first).shape[0]
        lo = (i * E_loc).astype(top_i.dtype)
        li = top_i - lo
        ok = (li >= 0) & (li < E_loc)
        w = jnp.where(ok, top_w, jnp.zeros_like(top_w))
        li = jnp.where(ok, li, jnp.zeros_like(li))  # masked rows hit expert 0
        if packed:
            out = _moe_ragged_apply_q(spec, st, x, w, li)
        else:
            out = _moe_ragged_apply(spec, st, x, w, li)
        return jax.lax.psum(out, axis)

    # jax>=0.7 renamed check_rep -> check_vma; probe once and pass the right
    # kwarg (psum of a shard-local partial is VMA-invalid under strict checking
    # because each shard's pre-psum value genuinely differs).
    import inspect

    kw = {}
    params = inspect.signature(shard_map).parameters
    if "check_vma" in params:
        kw["check_vma"] = False
    elif "check_rep" in params:
        kw["check_rep"] = False
    return shard_map(
        local, mesh=mesh,
        in_specs=(st_specs, rep, rep, rep), out_specs=rep, **kw,
    )(stacked, x, top_w, top_i)
