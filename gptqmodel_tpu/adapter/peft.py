"""LoRA finetuning on a quantized base model (PEFT integration analog).

TPU-native counterpart of the reference's PEFT path (gptqmodel/adapter/
peft.py: LoRA training over frozen quantized weights): the packed
``QuantLinear`` weights stay frozen int codes; only the low-rank ``lora_A``/
``lora_B`` leaves train. Design:

- the trainable state is a SMALL separate pytree ``{module_path: (A, B)}`` —
  gradients never touch the packed int tensors (no integer-cotangent
  gymnastics, tiny optimizer state);
- ``set_lora`` grafts the trainable tree onto the params functionally
  (dataclasses.replace on shared-array copies), so one jitted train step
  closes over nothing;
- the fused kernels already apply ``y += (x @ A) @ B`` in-forward
  (ops/registry.qlinear_forward, reference adapter/adapter.py:148), so a
  trained adapter serves at full speed with no merge step;
- adapters save/load through the existing EoRA sidecar
  (writer.collect_adapters / BaseQModel._attach_adapters).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gptqmodel_tpu.models.spec import ModelSpec
from gptqmodel_tpu.models.transformer import get_by_path, set_by_path
from gptqmodel_tpu.ops.qlinear import QuantLinear

log = logging.getLogger("gptqmodel_tpu")


def _walk_quant_modules(tree, prefix=""):
    if isinstance(tree, QuantLinear):
        yield prefix, tree
        return
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk_quant_modules(v, f"{prefix}.{k}" if prefix else k)
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            yield from _walk_quant_modules(v, f"{prefix}.{i}")


def attach_lora(
    params: dict,
    rank: int = 8,
    targets: Optional[set[str]] = None,
    seed: int = 0,
    init_scale: float = 0.01,
) -> dict:
    """Initialize a trainable LoRA tree over the quantized modules.

    ``targets``: leaf module names to adapt (e.g. {"q_proj", "v_proj"});
    None adapts every QuantLinear. Returns {path: (A [in,r], B [r,out])}
    with the standard A~N(0,s), B=0 init (adapter output starts at zero).
    """
    rng = np.random.default_rng(seed)
    lora: dict[str, tuple] = {}
    for path, q in _walk_quant_modules(params):
        leaf = path.rsplit(".", 1)[-1]
        if targets is not None and leaf not in targets:
            continue
        A = rng.normal(0.0, init_scale, (q.in_features, rank)).astype(np.float32)
        B = np.zeros((rank, q.out_features), np.float32)
        lora[path] = (jnp.asarray(A), jnp.asarray(B))
    if not lora:
        raise ValueError("no quantized modules matched the LoRA targets")
    return lora


def set_lora(params: dict, lora: dict) -> dict:
    """Structural copy of ``params`` with LoRA leaves grafted on (arrays
    shared; safe inside jit)."""
    out = jax.tree.map(lambda x: x, params)
    for path, (A, B) in lora.items():
        q = get_by_path(out, path)
        set_by_path(out, path, dataclasses.replace(q, lora_A=A, lora_B=B))
    return out


def collect_lora(params: dict) -> dict:
    """Inverse of set_lora: pull attached adapters off a params tree."""
    return {
        path: (q.lora_A, q.lora_B)
        for path, q in _walk_quant_modules(params)
        if q.lora_A is not None
    }


def lora_train(
    spec: ModelSpec,
    params: dict,
    input_ids: np.ndarray,  # [N, T] token rows
    row_mask: Optional[np.ndarray] = None,  # [N, T] 1 = real token
    lora: Optional[dict] = None,
    rank: int = 8,
    targets: Optional[set[str]] = None,
    steps: int = 100,
    batch_size: int = 4,
    learning_rate: float = 2e-4,
    weight_decay: float = 0.0,
    seed: int = 0,
    dtype=jnp.float32,
    log_every: int = 10,
    callback: Optional[Callable[[int, float], None]] = None,
) -> tuple[dict, list[float]]:
    """Train LoRA adapters with AdamW on causal-LM loss.

    Returns (trained lora tree, per-step losses). Attach the result with
    ``set_lora(params, lora)`` — inference picks it up immediately.
    """
    import optax

    from gptqmodel_tpu.models.transformer import forward_logits

    if lora is None:
        lora = attach_lora(params, rank=rank, targets=targets, seed=seed)
    opt = optax.adamw(learning_rate, weight_decay=weight_decay)
    opt_state = opt.init(lora)

    if row_mask is None:
        row_mask = np.ones_like(input_ids, dtype=np.float32)

    @jax.jit
    def train_step(lora, opt_state, params, ids, mask):
        def loss_fn(lora):
            p = set_lora(params, lora)
            logits = forward_logits(spec, p, ids, dtype=dtype)
            logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
            ll = jnp.take_along_axis(logp, ids[:, 1:, None], axis=-1)[..., 0]
            m = mask[:, 1:]
            return -(ll * m).sum() / jnp.maximum(m.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, opt_state = opt.update(grads, opt_state, lora)
        return optax.apply_updates(lora, updates), opt_state, loss

    N = input_ids.shape[0]
    rng = np.random.default_rng(seed)
    losses: list[float] = []
    for step in range(steps):
        idx = rng.choice(N, size=min(batch_size, N), replace=False)
        ids = jnp.asarray(input_ids[idx])
        m = jnp.asarray(row_mask[idx], jnp.float32)
        lora, opt_state, loss = train_step(lora, opt_state, params, ids, m)
        losses.append(float(loss))
        if callback:
            callback(step, losses[-1])
        if log_every and step % log_every == 0:
            log.info("lora step %d/%d loss %.4f", step, steps, losses[-1])
    return lora, losses
