"""Statistically-powered quality-floor regression gates (VERDICT r4 #3).

The reference's core quality gate records per-task metric floors on real
models (reference tests/models/model_test.py:1539 ``quantModel`` +
tests/models/test_llama3_2.py:28-55: {value, floor_pct}). Real pretrained
weights are unreachable offline, so the floor pattern is applied to what
CAN be measured with real statistical power:

- **fp-vs-quant choice agreement** on the bundled 300-sample task
  (tests/tasks/large/synth_arc_300.jsonl): the fraction of samples where
  the full-pipeline-quantized model picks the same choice as fp. At n=300
  the binomial std at p~0.95 is ~1.3%, so a few-percent regression FAILS
  the gate (the 6-10-sample files cannot do that).
- **held-out perplexity ratio** (quant/fp) on 48x64 held-out rows.

Both floors are RECORDED constants measured on this tree (seeds fixed,
full GPTQ pipeline: capture -> Hessian -> solve -> pack -> replay), for
the tiny-llama AND tiny-MoE full-pipeline configs.
"""

import tempfile
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_e2e_quantize import _calib, _make_tiny

# Recorded on 2026-08-20 (round 4) with seeds below; floor_pct mirrors the
# reference's ±4-5% discipline. If a kernel/solver change drops agreement
# or lifts the ppl ratio past these, the gate fails.
RECORDED = {
    "llama": {"agreement": 0.9800, "ppl_ratio": 1.0001},
    "qwen3_moe": {"agreement": 0.9333, "ppl_ratio": 1.0000},
}
AGREEMENT_FLOOR_PCT = 5.0
PPL_RATIO_HEADROOM_PCT = 5.0

TASK = Path(__file__).parent / "tasks" / "large" / "synth_arc_300.jsonl"


def _byte_encode(s):  # offline text->ids (tests/test_eval.py pattern)
    return [b + 3 for b in s.encode("utf-8")][:48]


def _quantize_pair(model_type: str, tmp: str):
    """(fp model, full-pipeline GPTQ-quantized model) for a tiny config."""
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    over = dict(vocab_size=512)
    if model_type == "qwen3_moe":
        over.update(
            num_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
            decoder_sparse_step=1, norm_topk_prob=True, head_dim=16,
            mlp_only_layers=[],
        )
    src = _make_tiny(tmp, model_type, **over)
    fp = GPTQModel.load(src)
    fp._load_params()
    q = GPTQModel.load(
        src, QuantizeConfig(bits=4, group_size=32, fallback_min_samples=4))
    q.quantize(_calib(16, 64, vocab=512, seed=0), batch_size=4)
    return fp, q


def _heldout_rows(n=48, T=64, vocab=512, seed=99):
    rng = np.random.default_rng(seed)
    return rng.integers(1, vocab, size=(n, T)).astype(np.int32)


@pytest.mark.parametrize("model_type", ["llama", "qwen3_moe"])
def test_quality_floor_full_pipeline(model_type):
    from gptqmodel_tpu.inference.engine import perplexity
    from gptqmodel_tpu.utils.eval import (
        assert_quality_floor, evaluate_choice_task, load_choice_task)

    samples = load_choice_task(TASK)
    assert len(samples) == 300
    with tempfile.TemporaryDirectory() as tmp:
        fp, q = _quantize_pair(model_type, tmp)

        res_fp = evaluate_choice_task(
            fp, samples, encode=_byte_encode, return_picks=True)
        res_q = evaluate_choice_task(
            q, samples, encode=_byte_encode, return_picks=True)
        agreement = float(np.mean(
            np.asarray(res_fp["picks"]) == np.asarray(res_q["picks"])))

        rows = _heldout_rows()
        ppl_fp = perplexity(fp.spec, fp.params, rows, batch_size=8)
        ppl_q = perplexity(q.spec, q.params, rows, batch_size=8)
        ratio = ppl_q / ppl_fp

        rec = RECORDED[model_type]
        print(f"\n[{model_type}] agreement={agreement:.4f} "
              f"(recorded {rec['agreement']}), ppl_ratio={ratio:.4f} "
              f"(recorded {rec['ppl_ratio']}), "
              f"acc fp={res_fp['acc']:.3f} q={res_q['acc']:.3f}")

        assert_quality_floor(
            agreement, rec["agreement"], floor_pct=AGREEMENT_FLOOR_PCT)
        ceiling = rec["ppl_ratio"] * (1 + PPL_RATIO_HEADROOM_PCT / 100)
        assert ratio <= ceiling, (
            f"ppl regression: quant/fp {ratio:.4f} > ceiling {ceiling:.4f}")
        # sanity: quantization must not be a no-op (models really differ)
        assert agreement < 1.0 or ratio != 1.0
