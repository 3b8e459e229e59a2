"""Self-contained eval harness: loglikelihood choice tasks + perplexity.

Analog of the reference's eval integration (tests/eval.py wrapping the
ModelCloud `evalution` toolkit with arc/gsm8k/mmlu task defs): this
environment is zero-egress, so tasks are consumed from LOCAL data — any
iterable of samples — instead of hub downloads. The scoring rule matches
lm-eval's multiple-choice protocol: pick the answer with the highest
total (or length-normalized) log-likelihood of the choice continuation
given the question context.

Quality-floor regression (reference ModelTest.quantModel semantics,
tests/models/model_test.py:1539): ``assert_quality_floor`` compares a
quantized model's metric against a recorded baseline with a tolerated
percentage drop.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterable, Optional

import numpy as np

import jax
import jax.numpy as jnp


@dataclass
class ChoiceSample:
    context: str  # question / prompt text
    choices: list[str]  # candidate continuations
    answer: int  # index of the gold choice


def _continuation_loglik(spec, params, ctx_ids, cont_ids, dtype=jnp.float32):
    """Σ log P(cont | ctx) under the model (single sequence)."""
    from gptqmodel_tpu.models.transformer import forward_logits

    ids = np.concatenate([ctx_ids, cont_ids])
    logits = np.asarray(
        forward_logits(spec, params, jnp.asarray(ids[None, :]), dtype=dtype)
    )[0]
    # token t is predicted by logits at t-1
    start = len(ctx_ids) - 1
    sel = logits[start : start + len(cont_ids)].astype(np.float64)
    m = sel.max(-1, keepdims=True)  # stable log-softmax
    logp = sel - (np.log(np.exp(sel - m).sum(-1, keepdims=True)) + m)
    return float(logp[np.arange(len(cont_ids)), cont_ids].sum())


def evaluate_choice_task(
    model,
    samples: Iterable[ChoiceSample | dict],
    tokenizer=None,
    length_normalized: bool = False,
    dtype=jnp.float32,
    encode: Optional[Callable[[str], list[int]]] = None,
) -> dict:
    """Multiple-choice accuracy (acc and acc_norm in one pass).

    ``encode`` overrides the tokenizer (tests pass token lists directly via
    dict samples with 'context_ids'/'choice_ids')."""
    if model.params is None:
        model._load_params()
    n, correct, correct_norm = 0, 0, 0
    enc = encode or (lambda s: tokenizer(s)["input_ids"])
    for s in samples:
        if isinstance(s, dict) and "context_ids" in s:
            ctx = np.asarray(s["context_ids"], np.int32)
            choice_ids = [np.asarray(c, np.int32) for c in s["choice_ids"]]
            answer = s["answer"]
        else:
            if isinstance(s, dict):
                s = ChoiceSample(**s)
            ctx = np.asarray(enc(s.context), np.int32)
            choice_ids = [np.asarray(enc(" " + c), np.int32) for c in s.choices]
            answer = s.answer
        lls = [
            _continuation_loglik(model.spec, model.params, ctx, c, dtype)
            for c in choice_ids
        ]
        lls_norm = [ll / max(len(c), 1) for ll, c in zip(lls, choice_ids)]
        correct += int(np.argmax(lls) == answer)
        correct_norm += int(np.argmax(lls_norm) == answer)
        n += 1
    return {
        "acc": correct / max(n, 1),
        "acc_norm": correct_norm / max(n, 1),
        "n": n,
    }


def assert_quality_floor(value: float, baseline: float, floor_pct: float = 4.0):
    """Reference ModelTest floor semantics: value must be within
    ``floor_pct`` percent below the recorded baseline."""
    floor = baseline * (1.0 - floor_pct / 100.0)
    assert value >= floor, (
        f"quality regression: {value:.4f} < floor {floor:.4f} "
        f"(baseline {baseline:.4f} - {floor_pct}%)"
    )
    return True
