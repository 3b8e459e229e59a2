"""Online Hadamard (QuaRot runtime transform; reference set_had_K analog)."""

import tempfile
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from tests.test_e2e_quantize import _calib, _fidelity, _make_tiny


def test_fht_matches_hadamard_matrix_and_involution():
    from gptqmodel_tpu.ops.hadamard import fht, fht_np
    from gptqmodel_tpu.quantization.rotation import hadamard_matrix

    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 64)).astype(np.float32)
    H = hadamard_matrix(64).astype(np.float32)
    np.testing.assert_allclose(fht_np(x, 64), x @ H, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fht(jnp.asarray(x), 64)), x @ H, atol=1e-5)
    # blockwise = I ⊗ H_16
    got = fht_np(x, 16)
    ref = (x.reshape(5, 4, 16) @ hadamard_matrix(16).astype(np.float32)).reshape(5, 64)
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # involution: T(T(x)) == x
    np.testing.assert_allclose(fht_np(fht_np(x, 64), 64), x, atol=1e-5)


def test_online_had_e2e_quality_and_roundtrip():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        calib = _calib(8)
        eval_ids = jnp.asarray(np.stack(_calib(2, 48, seed=11)))

        fp = GPTQModel.load(src)
        fp._load_params()
        fp_logits = np.asarray(forward_logits(fp.spec, fp.params, eval_ids))

        m = GPTQModel.load(
            src, QuantizeConfig(bits=4, group_size=32, rotation="online")
        )
        m.quantize(calib, batch_size=4)
        down = m.params["model"]["layers"][0]["mlp"]["down_proj"]
        assert down.had_block == 128  # intermediate 128 is a power of two
        assert m.params["model"]["layers"][0]["self_attn"]["q_proj"].had_block == 0

        err = _fidelity(
            np.asarray(forward_logits(m.spec, m.params, eval_ids)), fp_logits
        )
        base = GPTQModel.load(src, QuantizeConfig(bits=4, group_size=32))
        base.quantize(_calib(8), batch_size=4)
        err_base = _fidelity(
            np.asarray(forward_logits(base.spec, base.params, eval_ids)), fp_logits
        )
        # transform must not hurt (usually helps on outlier-heavy inputs)
        assert err < err_base * 1.5, (err, err_base)

        a = np.asarray(forward_logits(m.spec, m.params, eval_ids))
        out = Path(tmp) / "q"
        m.save(out)
        m2 = GPTQModel.load(out)
        assert m2.params["model"]["layers"][0]["mlp"]["down_proj"].had_block == 128
        b = np.asarray(forward_logits(m2.spec, m2.params, eval_ids))
        np.testing.assert_allclose(b, a, atol=1e-5)


def test_online_had_export_dequantized_original_space():
    """HF dequant export must return ORIGINAL-space weights (no runtime
    transform needed by consumers)."""
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.loader import CheckpointReader

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        m = GPTQModel.load(
            src, QuantizeConfig(bits=4, group_size=32, rotation="online")
        )
        m.quantize(_calib(8), batch_size=4)
        qdir, hdir = Path(tmp) / "q", Path(tmp) / "hf"
        m.save(qdir)
        GPTQModel.export(qdir, hdir, dtype="float32")

        orig = CheckpointReader(src).get("model.layers.0.mlp.down_proj.weight")
        deq = CheckpointReader(hdir).get("model.layers.0.mlp.down_proj.weight")
        rel = np.linalg.norm(deq.astype(np.float32) - orig.astype(np.float32)) / (
            np.linalg.norm(orig.astype(np.float32))
        )
        assert rel < 0.2, rel  # 4-bit error only — NOT a rotated basis
