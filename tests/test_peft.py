"""LoRA finetuning on a quantized base (reference adapter/peft.py parity).

The base packed weights must stay frozen; only lora_A/B train; the trained
adapter must survive save/reload through the EoRA sidecar.
"""

import tempfile
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from tests.test_e2e_quantize import _calib, _make_tiny


def _train_rows(n=16, T=24, vocab=128, seed=0):
    """Synthetic task: every sequence ends with the same sentinel pattern —
    trivially learnable, so loss must drop."""
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, vocab, size=(n, T))
    ids[:, T // 2 :] = (np.arange(T - T // 2) % 5) + 7  # fixed suffix
    return ids.astype(np.int32)


def test_lora_train_loss_drops_and_base_frozen():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        m = GPTQModel.load(src, QuantizeConfig(bits=4, group_size=32))
        m.quantize(_calib(8), batch_size=4)

        before = {
            "qweight": np.asarray(
                m.params["model"]["layers"][0]["self_attn"]["q_proj"].qweight
            ).copy(),
            "scales": np.asarray(
                m.params["model"]["layers"][0]["self_attn"]["q_proj"].scales
            ).copy(),
        }
        losses = m.peft_train(
            _train_rows(), rank=8, steps=120, batch_size=8,
            learning_rate=1e-2,
        )
        assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9, losses[:3] + losses[-3:]

        q = m.params["model"]["layers"][0]["self_attn"]["q_proj"]
        np.testing.assert_array_equal(np.asarray(q.qweight), before["qweight"])
        np.testing.assert_array_equal(np.asarray(q.scales), before["scales"])
        assert q.lora_A is not None and q.lora_A.shape == (64, 8)
        assert m.params["model"]["layers"][0]["mlp"]["gate_proj"].lora_A is not None


def test_lora_save_reload_roundtrip():
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        m = GPTQModel.load(src, QuantizeConfig(bits=4, group_size=32))
        m.quantize(_calib(8), batch_size=4)
        m.peft_train(_train_rows(8), rank=4, steps=5, targets={"q_proj"})
        # untargeted module has no adapter
        assert m.params["model"]["layers"][0]["mlp"]["gate_proj"].lora_A is None

        eval_ids = jnp.asarray(np.stack(_calib(2, 24, seed=9)))
        a = np.asarray(forward_logits(m.spec, m.params, eval_ids))

        out = Path(tmp) / "q"
        m.save(out)
        assert (out / "eora" / "adapter_model.safetensors").exists()
        m2 = GPTQModel.load(out)
        q2 = m2.params["model"]["layers"][0]["self_attn"]["q_proj"]
        assert q2.lora_A is not None
        b = np.asarray(forward_logits(m2.spec, m2.params, eval_ids))
        np.testing.assert_allclose(b, a, atol=2e-5)
