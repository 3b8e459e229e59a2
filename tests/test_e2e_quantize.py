"""End-to-end slice: quantize -> save -> reload -> infer (SURVEY §7 step 3).

Models the reference's ModelTest harness (tests/models/model_test.py):
quantize a tiny random-weight model with calibration, assert quality vs the
fp baseline (here: logits fidelity + GPTQ <= RTN on calibration-distribution
data), and checkpoint roundtrip bit-exactness.
"""

import json
import tempfile
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp


def _make_tiny(tmp, model_type="llama", **over):
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    base = dict(
        model_type=model_type,
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    base.update(over)
    cfg = AutoConfig.for_model(**base)
    torch.manual_seed(0)
    model = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
    d = Path(tmp) / f"tiny_{model_type}"
    model.save_pretrained(d, safe_serialization=True)
    return d


def _calib(n_rows=16, T=64, vocab=256, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(1, vocab, size=(T,)) for _ in range(n_rows)]


def _fidelity(a, b):
    """Relative L2 error between logit sets."""
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return float(np.linalg.norm(a - b) / np.linalg.norm(b))


def test_quantize_save_reload_llama():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits
    from gptqmodel_tpu.ops.qlinear import QuantLinear

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        calib = _calib()
        eval_ids = np.stack(_calib(4, 48, seed=7))

        # fp reference logits
        fp = GPTQModel.load(src)
        fp._load_params()
        fp_logits = np.asarray(forward_logits(fp.spec, fp.params, jnp.asarray(eval_ids)))

        # GPTQ quantize
        m = GPTQModel.load(src, QuantizeConfig(bits=4, group_size=32))
        log_rows = m.quantize(calib, batch_size=4)
        assert len(log_rows) == 2 * 7  # 2 layers x 7 linears
        assert all(not r["fallback"] for r in log_rows)

        q_logits = np.asarray(forward_logits(m.spec, m.params, jnp.asarray(eval_ids)))
        gptq_err = _fidelity(q_logits, fp_logits)
        assert gptq_err < 0.5, f"quantized logits diverged: {gptq_err}"

        # save -> reload -> bit-exact logits through the v1 disk roundtrip
        out = Path(tmp) / "quantized"
        m.save(out)
        assert (out / "quantize_config.json").exists()
        assert (out / "quant_log.csv").exists()
        cfg = json.loads((out / "config.json").read_text())
        assert cfg["quantization_config"]["bits"] == 4

        m2 = GPTQModel.load(out)
        assert m2.quantized
        n_ql = sum(
            isinstance(x, QuantLinear)
            for lp in m2.params["model"]["layers"]
            for x in _walk_leaves(lp)
        )
        assert n_ql == 14
        r_logits = np.asarray(forward_logits(m2.spec, m2.params, jnp.asarray(eval_ids)))
        np.testing.assert_allclose(r_logits, q_logits, rtol=1e-5, atol=1e-5)


def _walk_leaves(tree):
    from gptqmodel_tpu.ops.qlinear import QuantLinear

    if isinstance(tree, QuantLinear):
        yield tree
    elif isinstance(tree, dict):
        for v in tree.values():
            yield from _walk_leaves(v)
    elif isinstance(tree, list):
        for v in tree:
            yield from _walk_leaves(v)


def test_gptq_beats_rtn_on_calibration_distribution():
    """GPTQ's Hessian-aware solve must beat naive RTN on data drawn from the
    calibration distribution (the core quality claim of the method)."""
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        calib = _calib(24, 64)
        eval_ids = np.stack(_calib(4, 64, seed=123))

        fp = GPTQModel.load(src)
        fp._load_params()
        fp_logits = np.asarray(forward_logits(fp.spec, fp.params, jnp.asarray(eval_ids)))

        errs = {}
        for method, kw in {
            "gptq": dict(),
            "rtn": dict(mock_quantization=True),
        }.items():
            m = GPTQModel.load(src, QuantizeConfig(bits=3, group_size=32, **kw))
            m.quantize(calib, batch_size=4)
            ql = np.asarray(forward_logits(m.spec, m.params, jnp.asarray(eval_ids)))
            errs[method] = _fidelity(ql, fp_logits)
        assert errs["gptq"] < errs["rtn"], errs


def test_dynamic_exclusion_and_override():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.ops.qlinear import QuantLinear

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        qcfg = QuantizeConfig(
            bits=4,
            group_size=32,
            dynamic={
                r"-:.*\.o_proj": None,  # exclude o_proj
                r"+:.*\.down_proj": {"bits": 8},  # 8-bit down_proj
            },
        )
        m = GPTQModel.load(src, qcfg)
        rows = m.quantize(_calib(8), batch_size=4)
        mods = {r["module"]: r for r in rows}
        assert not any("o_proj" in k for k in mods)
        assert mods["mlp.down_proj"]["bits"] == 8
        assert mods["self_attn.q_proj"]["bits"] == 4
        # o_proj stayed dense
        lp0 = m.params["model"]["layers"][0]
        assert not isinstance(lp0["self_attn"]["o_proj"], QuantLinear)
        assert isinstance(lp0["mlp"]["down_proj"], QuantLinear)


def test_quantize_moe_with_failsafe():
    """Tiny qwen3_moe: per-expert quantization; rarely-routed experts fall
    back to RTN and are recorded (reference coverage policy)."""
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(
            tmp, "qwen3_moe",
            num_experts=4, num_experts_per_tok=1, moe_intermediate_size=32,
            decoder_sparse_step=1, norm_topk_prob=True, head_dim=16,
            mlp_only_layers=[], num_hidden_layers=1,
        )
        qcfg = QuantizeConfig(bits=4, group_size=32, fallback_min_samples=8)
        m = GPTQModel.load(src, qcfg)
        rows = m.quantize(_calib(8, 32), batch_size=4)
        expert_rows = [r for r in rows if "experts" in r["module"]]
        assert len(expert_rows) == 4 * 3  # 4 experts x gate/up/down
        # all experts produced a packed module, fallback or not
        lp0 = m.params["model"]["layers"][0]
        assert len(lp0["mlp"]["experts"]) == 4


def test_generate_after_quantize():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        m = GPTQModel.load(src, QuantizeConfig(bits=4, group_size=32))
        m.quantize(_calib(8), batch_size=4)
        ids = np.arange(1, 13).reshape(2, 6)
        out = m.generate(ids, max_new_tokens=8, dtype=jnp.float32)
        assert out.shape == (2, 8)
        assert (out >= 0).all() and (out < m.spec.vocab_size).all()


def test_kv_cache_decode_matches_full_forward():
    """Greedy decode through the KV cache must equal argmax of the full
    forward at every step (prefill/decode correctness anchor)."""
    from gptqmodel_tpu import GPTQModel
    from gptqmodel_tpu.inference.engine import greedy_generate
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        fp = GPTQModel.load(src)
        fp._load_params()
        rng = np.random.default_rng(3)
        ids = rng.integers(1, 250, size=(2, 10)).astype(np.int32)
        lens = np.array([10, 6], dtype=np.int32)
        ids[1, 6:] = 0  # right-pad row 1

        steps = 5
        got = greedy_generate(
            fp.spec, fp.params, ids, lens, max_new_tokens=steps, dtype=jnp.float32
        )

        # oracle: grow each sequence token-by-token with full forwards
        for b in range(2):
            seq = list(ids[b, : lens[b]])
            for s in range(steps):
                logits = np.asarray(
                    forward_logits(
                        fp.spec, fp.params, jnp.asarray([seq], dtype=jnp.int32)
                    )
                )
                nxt = int(np.argmax(logits[0, -1]))
                assert nxt == int(got[b, s]), (b, s, nxt, got[b, s])
                seq.append(nxt)


def test_tp_pad_non_multiple_in_features():
    """TP padder (reference TensorParallelPadderConfig): a module whose
    in-features is not a multiple of lcm(8, group_size) is solved in padded
    space and truncated back — lifecycle must stay intact."""
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits
    from gptqmodel_tpu.ops.qlinear import QuantLinear

    with tempfile.TemporaryDirectory() as tmp:
        # intermediate=96 -> down_proj in_features 96 % 64 != 0 after lcm(8,64)=64
        src = _make_tiny(tmp, intermediate_size=96)
        calib = _calib(12)
        m = GPTQModel.load(
            src, QuantizeConfig(bits=4, group_size=64, tp_pad=True)
        )
        rows = m.quantize(calib, batch_size=4)
        assert all(not r["fallback"] for r in rows)
        down = m.params["model"]["layers"][0]["mlp"]["down_proj"]
        assert isinstance(down, QuantLinear)
        assert down.in_features == 96
        eval_ids = np.stack(_calib(2, 32, seed=3))
        logits = np.asarray(
            forward_logits(m.spec, m.params, jnp.asarray(eval_ids))
        )
        assert np.isfinite(logits).all()


def test_pack_workers_byte_identical():
    """pack_workers>0 moves host packing + journal writes into worker
    threads (reference stage_layer.py:714-940 overlap) — the ONLY allowed
    difference is timing. Quantizing the same model with workers on/off
    must produce byte-identical checkpoints (race/ordering audit for the
    worker path, VERDICT r2 §5.2)."""
    import hashlib

    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    def run(workers, tmp):
        src = _make_tiny(tmp)
        m = GPTQModel.load(
            src, QuantizeConfig(bits=4, group_size=32, pack_workers=workers)
        )
        m.quantize(_calib(8), batch_size=4)
        out = Path(tmp) / f"q{workers}"
        m.save(out)
        h = {}
        for f in sorted(out.iterdir()):
            if f.suffix in (".safetensors",):
                h[f.name] = hashlib.sha256(f.read_bytes()).hexdigest()
        return h

    with tempfile.TemporaryDirectory() as t0:
        h0 = run(0, t0)
    with tempfile.TemporaryDirectory() as t2:
        h2 = run(2, t2)
    assert h0 == h2 and h0, (h0, h2)
