"""EoRA adapter tests: math, quality ordering, checkpoint sidecar roundtrip.

Models the reference EoRA coverage (eora/eora.py math, adapter/adapter.py
fused apply, GPTQModel.adapter.generate e2e): the rank-r correction must
reduce the activation-weighted error, beat a plain (unweighted) SVD under
skewed activations, and survive save/reload.
"""

import tempfile
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from tests.test_e2e_quantize import _calib, _fidelity, _make_tiny


def test_eora_reduces_weighted_error():
    from gptqmodel_tpu.quantization.eora import compute_eora, eora_correction_quality

    rng = np.random.default_rng(0)
    out_f, in_f, r = 48, 96, 8
    delta = rng.standard_normal((out_f, in_f)).astype(np.float32) * 0.02
    mag = np.ones(in_f); mag[:6] = 15.0
    X = rng.standard_normal((1024, in_f)).astype(np.float32) * mag
    G = X.T @ X
    A, B = compute_eora(delta, G, r)
    assert A.shape == (in_f, r) and B.shape == (r, out_f)
    before, after = eora_correction_quality(delta, G, jnp.asarray(A), jnp.asarray(B))
    assert after < before * 0.9

    # eigen-scaling must beat the plain (unweighted) truncated SVD on the
    # weighted metric — the whole point of EoRA vs vanilla LoRA-of-delta
    U, s, Vt = np.linalg.svd(delta, full_matrices=False)
    A0 = Vt[:r].T.astype(np.float32)
    B0 = (U[:, :r] * s[:r]).T.astype(np.float32)
    _, after_plain = eora_correction_quality(delta, G, jnp.asarray(A0), jnp.asarray(B0))
    assert after <= after_plain * 1.001


def test_eora_e2e_quality_and_roundtrip():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        calib = _calib(16, 64)
        eval_ids = np.stack(_calib(4, 48, seed=7))
        fp = GPTQModel.load(src)
        fp._load_params()
        fp_logits = np.asarray(forward_logits(fp.spec, fp.params, jnp.asarray(eval_ids)))

        errs = {}
        for name, adapter in {"plain": None, "eora": {"name": "eora", "rank": 16}}.items():
            m = GPTQModel.load(
                src, QuantizeConfig(bits=3, group_size=32, adapter=adapter)
            )
            m.quantize(calib, batch_size=4)
            ql = np.asarray(forward_logits(m.spec, m.params, jnp.asarray(eval_ids)))
            errs[name] = _fidelity(ql, fp_logits)
            if name == "eora":
                out = Path(tmp) / "q_eora"
                m.save(out)
        assert errs["eora"] < errs["plain"], errs

        # sidecar exists and reload preserves the corrected logits
        assert (Path(tmp) / "q_eora" / "eora" / "adapter_model.safetensors").exists()
        m2 = GPTQModel.load(Path(tmp) / "q_eora")
        lp0 = m2.params["model"]["layers"][0]
        assert lp0["self_attn"]["q_proj"].lora_A is not None
        assert lp0["self_attn"]["q_proj"].lora_A.shape[1] == 16
        r_logits = np.asarray(forward_logits(m2.spec, m2.params, jnp.asarray(eval_ids)))
        err_reload = _fidelity(r_logits, fp_logits)
        assert abs(err_reload - errs["eora"]) < 5e-3


def test_posthoc_adapter_generate():
    """GPTQModel.adapter.generate (reference auto.py:758): existing
    quantized checkpoint + native checkpoint -> sidecar adapters that
    improve logits fidelity; reload picks the sidecar up automatically."""
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        calib = _calib()
        eval_ids = np.stack(_calib(4, 48, seed=7))

        fp = GPTQModel.load(src)
        fp._load_params()
        fp_logits = np.asarray(
            forward_logits(fp.spec, fp.params, jnp.asarray(eval_ids))
        )

        # quantize WITHOUT adapters, save
        m = GPTQModel.load(src, QuantizeConfig(bits=3, group_size=32))
        m.quantize(calib, batch_size=4)
        qdir = Path(tmp) / "q"
        m.save(qdir)
        base_logits = np.asarray(
            forward_logits(m.spec, m.params, jnp.asarray(eval_ids))
        )
        base_err = _fidelity(base_logits, fp_logits)

        # post-hoc adapter generation against the native checkpoint
        qm = GPTQModel.adapter.generate(
            model_id_or_path=src,
            quantized_model_id_or_path=qdir,
            calibration_dataset=calib,
            rank=16,
            batch_size=4,
        )
        assert (qdir / "eora" / "adapter_model.safetensors").exists()
        eora_logits = np.asarray(
            forward_logits(qm.spec, qm.params, jnp.asarray(eval_ids))
        )
        eora_err = _fidelity(eora_logits, fp_logits)
        assert eora_err < base_err, (eora_err, base_err)

        # a fresh load picks the sidecar up and matches the in-memory model
        m2 = GPTQModel.load(qdir)
        q0 = m2.params["model"]["layers"][0]["self_attn"]["q_proj"]
        assert q0.lora_A is not None
        re_logits = np.asarray(
            forward_logits(m2.spec, m2.params, jnp.asarray(eval_ids))
        )
        np.testing.assert_allclose(re_logits, eora_logits, rtol=2e-4, atol=2e-4)
