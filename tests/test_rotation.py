"""QuaRot rotation tests: functional invariance + e2e quantization.

Models the reference rotation coverage (quantization/rotation): a rotated
fp model must produce identical logits; rotation + quantization must survive
save/reload and keep fidelity.
"""

import tempfile
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_e2e_quantize import _calib, _fidelity, _make_tiny


def test_hadamard_orthogonal():
    from gptqmodel_tpu.quantization.rotation import hadamard_matrix, random_orthogonal

    for n in (2, 64, 128):
        H = hadamard_matrix(n)
        np.testing.assert_allclose(H @ H.T, np.eye(n), atol=1e-10)
    Q = random_orthogonal(96, seed=1)
    np.testing.assert_allclose(Q @ Q.T, np.eye(96), atol=1e-10)


def test_rotation_preserves_model_function():
    """Fused+rotated fp model == original model (exact math invariance)."""
    from gptqmodel_tpu import GPTQModel
    from gptqmodel_tpu.models.transformer import forward_logits
    from gptqmodel_tpu.quantization.rotation import (
        rotate_base,
        rotate_layer,
        rotation_matrix,
    )

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)  # hidden=64 (pow2 -> hadamard)
        fp = GPTQModel.load(src)
        fp._load_params()
        ids = jnp.asarray(np.stack(_calib(2, 24, seed=3)))
        before = np.asarray(forward_logits(fp.spec, fp.params, ids))

        R = rotation_matrix(fp.spec.hidden_size, "hadamard")
        rotate_base(fp.spec, fp.params, R)
        for lp in fp.params["model"]["layers"]:
            rotate_layer(fp.spec, lp, R)
        # norms are now unit
        np.testing.assert_allclose(
            np.asarray(fp.params["model"]["layers"][0]["input_layernorm"]["weight"]),
            1.0,
        )
        after = np.asarray(forward_logits(fp.spec, fp.params, ids))
        np.testing.assert_allclose(after, before, rtol=1e-4, atol=2e-4)


def test_rotation_quantize_e2e():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        calib = _calib(12)
        eval_ids = jnp.asarray(np.stack(_calib(3, 40, seed=11)))
        fp = GPTQModel.load(src)
        fp._load_params()
        fp_logits = np.asarray(forward_logits(fp.spec, fp.params, eval_ids))

        m = GPTQModel.load(
            src, QuantizeConfig(bits=4, group_size=32, rotation="hadamard")
        )
        m.quantize(calib, batch_size=4)
        q_logits = np.asarray(forward_logits(m.spec, m.params, eval_ids))
        assert _fidelity(q_logits, fp_logits) < 0.5

        out = Path(tmp) / "rot"
        m.save(out)
        m2 = GPTQModel.load(out)
        r_logits = np.asarray(forward_logits(m2.spec, m2.params, eval_ids))
        np.testing.assert_allclose(r_logits, q_logits, rtol=1e-4, atol=1e-4)


def test_rotation_rejects_unsupported():
    from gptqmodel_tpu.models.spec import ModelSpec
    from gptqmodel_tpu.quantization.rotation import check_rotatable

    bad = ModelSpec(
        model_type="gemma2", vocab_size=10, hidden_size=8, intermediate_size=16,
        num_layers=1, num_heads=2, num_kv_heads=2, head_dim=4,
        rms_norm_offset=True,
    )
    with pytest.raises(NotImplementedError):
        check_rotatable(bad)
