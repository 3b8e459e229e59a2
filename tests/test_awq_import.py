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


def _zeros_width(in_f, g):
    """reference utils/gemv.py calculate_zeros_width (4-bit pack_num=8)."""
    mult = {128: 1, 64: 2, 32: 4}[min(g, 128)]
    base = -(-(in_f // g) // 8)
    return -(-base // mult) * mult


def _pack_gemv(codes_out_in: np.ndarray) -> np.ndarray:
    """reference gemv_awq.py:151 pack: identity order, nibbles along in."""
    out_f, in_f = codes_out_in.shape
    c = codes_out_in.reshape(out_f, in_f // 8, 8).astype(np.uint32)
    words = np.zeros((out_f, in_f // 8), np.uint32)
    for i in range(8):
        words |= c[:, :, i] << np.uint32(4 * i)
    return words.view(np.int32)


def test_awq_gemv_checkpoint_loads():
    """gemv-format checkpoint (reference gemv_awq.py layout) loads to the
    expected dequantized weights."""
    from gptqmodel_tpu import GPTQModel
    from gptqmodel_tpu.ops.qlinear import QuantLinear, dequantize_weight
    from tests.test_e2e_quantize import _make_tiny

    rng = np.random.default_rng(2)
    g = 32
    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        from safetensors.numpy import load_file

        tensors = load_file(Path(src) / "model.safetensors")
        out, expected = {}, {}
        for name, w in tensors.items():
            if name.endswith(".weight") and (
                "self_attn" in name or "mlp" in name
            ) and "norm" not in name:
                mod = name[: -len(".weight")]
                out_f, in_f = w.shape
                G = in_f // g
                zw = _zeros_width(in_f, g)
                codes = rng.integers(0, 16, size=(out_f, in_f), dtype=np.int64)
                zeros = rng.integers(0, 16, size=(out_f, G), dtype=np.int64)
                scales = rng.uniform(0.01, 0.05, size=(out_f, G)).astype(np.float16)
                zpad = np.zeros((out_f, zw * 8), np.int64)
                zpad[:, :G] = zeros
                spad = np.zeros((out_f, zw * 8), np.float16)
                spad[:, :G] = scales
                out[f"{mod}.qweight"] = _pack_gemv(codes)
                out[f"{mod}.qzeros"] = _pack_gemv(zpad)[:, : zw]
                out[f"{mod}.scales"] = spad
                expected[mod] = (
                    (codes.T - np.repeat(zeros.T, g, 0))
                    * np.repeat(scales.T.astype(np.float32), g, 0)
                )
            else:
                out[name] = w
        d = Path(tmp) / "awq_gemv_ckpt"
        d.mkdir()
        save_file(out, d / "model.safetensors", metadata={"format": "pt"})
        cfg = json.loads((Path(src) / "config.json").read_text())
        cfg["quantization_config"] = {
            "quant_method": "awq", "version": "gemv", "w_bit": 4,
            "q_group_size": g, "zero_point": True,
        }
        (d / "config.json").write_text(json.dumps(cfg))

        m = GPTQModel.load(d)
        q = m.params["model"]["layers"][0]["self_attn"]["q_proj"]
        assert isinstance(q, QuantLinear)
        w = np.asarray(dequantize_weight(q))
        np.testing.assert_allclose(
            w, expected["model.layers.0.self_attn.q_proj"], atol=1e-5
        )
        from gptqmodel_tpu.models.transformer import forward_logits

        logits = forward_logits(
            m.spec, m.params, jnp.asarray(np.arange(12)[None, :] % 250)
        )
        assert np.isfinite(np.asarray(logits)).all()


def test_awq_gemv_fast_roundtrip_vs_reference_pack():
    """awq_gemv_fast_to_gptq inverts the REFERENCE'S OWN pack_intweight
    (imported as a torch oracle) — non-tautological layout check."""
    import sys as _sys
    from pathlib import Path as _P

    _sys.path.insert(0, str(_P(__file__).parent))
    from ref_oracle import try_import

    import torch

    gemv_fast = try_import("gptqmodel.nn_modules.qlinear.gemv_fast_awq")
    from gptqmodel_tpu.ops.pack import awq_gemv_fast_to_gptq, unpack_qweight, unpack_qzeros

    rng = np.random.default_rng(3)
    N, K, g = 64, 128, 32
    G = K // g
    zw = _zeros_width(K, g)
    codes = rng.integers(0, 16, size=(N, K), dtype=np.int64)
    zeros = rng.integers(0, 16, size=(N, G), dtype=np.int64)
    scales = rng.uniform(0.01, 0.05, size=(N, G)).astype(np.float16)

    packed = gemv_fast.pack_intweight(
        torch.tensor(codes, dtype=torch.int32), interleave=4, kstride=64
    ).numpy()
    spad = np.zeros((N, zw * 8), np.float16)
    spad[:, :G] = scales
    qzeros_f = np.zeros((N, zw * 8), np.float16)
    qzeros_f[:, :G] = -(
        spad[:, :G].astype(np.float32) * zeros.astype(np.float32)
    ).astype(np.float16)

    qw, qz, sc = awq_gemv_fast_to_gptq(
        packed, spad.T.copy(), qzeros_f.T.copy(), group_size=g
    )
    np.testing.assert_array_equal(unpack_qweight(qw, 4), codes.T)
    np.testing.assert_array_equal(unpack_qzeros(qz, 4, v1=False), zeros.T)
    np.testing.assert_allclose(sc.astype(np.float32), scales.T, rtol=1e-3)
