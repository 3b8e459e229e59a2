"""AWQ-GEMM checkpoint import (AutoAWQ interop).

Builds a synthetic AutoAWQ-format checkpoint (out-dim interleaved pack, true
zeros, HF awq quantization_config schema) and verifies it loads to the same
dequantized weights and logits as the equivalent GPTQ-format checkpoint.
"""

import json
import tempfile
from pathlib import Path

import numpy as np
from safetensors.numpy import save_file

import jax.numpy as jnp


def _pack_awq(codes: np.ndarray) -> np.ndarray:
    """[rows, out] int codes -> AWQ-gemm int32 [rows, out/8] (4-bit)."""
    order = [0, 2, 4, 6, 1, 3, 5, 7]
    rows, out = codes.shape
    c = codes.reshape(rows, out // 8, 8).astype(np.uint32)
    words = np.zeros((rows, out // 8), np.uint32)
    for j, col in enumerate(order):
        words |= c[:, :, col] << np.uint32(4 * j)
    return words.view(np.int32)


def test_awq_unpack_roundtrip():
    from gptqmodel_tpu.ops.pack import unpack_awq_gemm

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, size=(64, 32), dtype=np.int64)
    packed = _pack_awq(codes)
    np.testing.assert_array_equal(unpack_awq_gemm(packed), codes)


def test_awq_gemm_checkpoint_loads():
    from gptqmodel_tpu import GPTQModel
    from gptqmodel_tpu.ops.qlinear import QuantLinear, dequantize_weight
    from tests.test_e2e_quantize import _make_tiny

    rng = np.random.default_rng(1)
    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)  # gives us a config.json + dense tensors
        # build an AWQ-format checkpoint: quantize nothing, just re-emit the
        # attention/mlp linears as synthetic packed modules
        from safetensors.numpy import load_file

        tensors = load_file(Path(src) / "model.safetensors")
        out = {}
        g = 32
        expected = {}
        for name, w in tensors.items():
            if name.endswith(".weight") and (
                "self_attn" in name or "mlp" in name
            ) and "norm" not in name:
                mod = name[: -len(".weight")]
                out_f, in_f = w.shape
                G = in_f // g
                codes = rng.integers(0, 16, size=(in_f, out_f), dtype=np.int64)
                zeros = rng.integers(0, 16, size=(G, out_f), dtype=np.int64)
                scales = rng.uniform(0.01, 0.05, size=(G, out_f)).astype(np.float16)
                out[f"{mod}.qweight"] = _pack_awq(codes)
                out[f"{mod}.qzeros"] = _pack_awq(zeros)
                out[f"{mod}.scales"] = scales
                expected[mod] = (
                    (codes - np.repeat(zeros, g, 0)) * np.repeat(
                        scales.astype(np.float32), g, 0
                    )
                )
            else:
                out[name] = w
        d = Path(tmp) / "awq_ckpt"
        d.mkdir()
        save_file(out, d / "model.safetensors", metadata={"format": "pt"})
        cfg = json.loads((Path(src) / "config.json").read_text())
        cfg["quantization_config"] = {
            "quant_method": "awq",
            "version": "gemm",
            "w_bit": 4,
            "q_group_size": g,
            "zero_point": True,
        }
        (d / "config.json").write_text(json.dumps(cfg))

        m = GPTQModel.load(d)
        assert m.qcfg.bits == 4 and m.qcfg.group_size == g and not m.qcfg.sym
        lp0 = m.params["model"]["layers"][0]
        q = lp0["self_attn"]["q_proj"]
        assert isinstance(q, QuantLinear)
        w = np.asarray(dequantize_weight(q))
        np.testing.assert_allclose(
            w, expected["model.layers.0.self_attn.q_proj"], atol=1e-5
        )
        # forward runs
        from gptqmodel_tpu.models.transformer import forward_logits

        logits = forward_logits(
            m.spec, m.params, jnp.asarray(np.arange(12)[None, :] % 250)
        )
        assert np.isfinite(np.asarray(logits)).all()
