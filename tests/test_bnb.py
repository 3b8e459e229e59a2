"""bitsandbytes NF4 import tests (hand-built serialized form — no bnb
package in this env, same as the reference decoding it for non-CUDA)."""

import json
import tempfile
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from gptqmodel_tpu.ops.bnb import (
    NF4_LUT,
    Bnb4Linear,
    dequant_nested_absmax,
    dequantize_bnb4,
    make_bnb4_linear,
)


def _nf4_quantize_ref(W: np.ndarray, blocksize=64):
    """Host-side NF4 quantizer (bnb quantize_4bit semantics): per-block
    absmax scale, nearest NF4 code, first elem in the HIGH nibble."""
    flat = W.reshape(-1)
    nb = len(flat) // blocksize
    blocks = flat.reshape(nb, blocksize)
    absmax = np.abs(blocks).max(axis=1)
    normed = blocks / np.maximum(absmax, 1e-12)[:, None]
    codes = np.abs(normed.reshape(-1, 1) - NF4_LUT[None, :]).argmin(axis=1)
    codes = codes.reshape(-1)
    packed = ((codes[0::2] << 4) | codes[1::2]).astype(np.uint8)
    return packed, absmax.astype(np.float32), codes


def test_bnb4_dequant_matches_reference_quantizer():
    rng = np.random.default_rng(0)
    W = rng.standard_normal((16, 64)).astype(np.float32) * 0.1
    packed, absmax, codes = _nf4_quantize_ref(W)
    p = make_bnb4_linear(packed, absmax, NF4_LUT, W.shape)
    back = np.asarray(dequantize_bnb4(p))
    # expected: lut[code] * blockscale
    expect = (NF4_LUT[codes] * np.repeat(absmax, 64)).reshape(W.shape)
    np.testing.assert_allclose(back, expect, atol=1e-6)
    rel = np.linalg.norm(back - W) / np.linalg.norm(W)
    assert rel < 0.15, rel  # nf4 error on gaussian data


def test_nested_absmax_dequant():
    rng = np.random.default_rng(1)
    true_absmax = rng.uniform(0.01, 0.2, 512).astype(np.float32)
    offset = float(true_absmax.mean())
    centered = true_absmax - offset
    # fabricate a double-quantization: 256-entry linear code
    nested_map = np.linspace(centered.min(), centered.max(), 256).astype(np.float32)
    nb = 256
    nested_absmax = []
    u8 = np.empty(512, np.uint8)
    for b in range(512 // nb):
        seg = centered[b * nb : (b + 1) * nb]
        s = 1.0  # keep scale 1 for an exact-grid test
        nested_absmax.append(s)
        u8[b * nb : (b + 1) * nb] = np.abs(
            seg[:, None] - nested_map[None, :]
        ).argmin(axis=1)
    out = dequant_nested_absmax(u8, nested_map, np.asarray(nested_absmax), offset, nb)
    assert np.abs(out - true_absmax).max() < (nested_map[1] - nested_map[0])


def test_bnb4_checkpoint_import_and_forward():
    """Full loader path: hand-serialize the HF-bnb tensor layout for a tiny
    llama, load through build_params_tree, run logits vs the fp model."""
    from safetensors.numpy import save_file

    from tests.test_transformer import _jax_logits, _tiny_llama_dir
    from gptqmodel_tpu.models.loader import CheckpointReader, build_params_tree
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        d, _ = _tiny_llama_dir(tmp, "llama", intermediate_size=128)
        spec, params, ids, fp_logits = _jax_logits(d)

        # serialize: linears as NF4, everything else verbatim
        flat = {}

        def walk(tree, prefix=""):
            if isinstance(tree, dict) and "weight" in tree and prefix.endswith(
                ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                 "up_proj", "down_proj")
            ):
                W = np.asarray(tree["weight"], np.float32)
                packed, absmax, _ = _nf4_quantize_ref(W)
                flat[f"{prefix}.weight"] = packed.reshape(-1, 1)
                flat[f"{prefix}.weight.absmax"] = absmax
                flat[f"{prefix}.weight.quant_map"] = NF4_LUT
                st = {"blocksize": 64, "quant_type": "nf4",
                      "shape": list(W.shape), "dtype": "float32"}
                flat[f"{prefix}.weight.quant_state.bitsandbytes__nf4"] = (
                    np.frombuffer(json.dumps(st).encode(), np.uint8).copy()
                )
                return
            if isinstance(tree, dict):
                for k, v in tree.items():
                    walk(v, f"{prefix}.{k}" if prefix else k)
            elif isinstance(tree, list):
                for i, v in enumerate(tree):
                    walk(v, f"{prefix}.{i}")
            else:
                flat[prefix] = np.asarray(tree)

        walk(params)
        bdir = Path(tmp) / "bnb"
        bdir.mkdir()
        save_file(flat, bdir / "model.safetensors", metadata={"format": "pt"})

        tree = build_params_tree(CheckpointReader(bdir))
        q0 = tree["model"]["layers"][0]["self_attn"]["q_proj"]
        assert isinstance(q0, Bnb4Linear) and q0.blocksize == 64
        got = np.asarray(
            forward_logits(spec, tree, jnp.asarray(ids), dtype=jnp.float32)
        )
        rel = np.linalg.norm(got - fp_logits) / np.linalg.norm(fp_logits)
        assert rel < 0.25, rel  # nf4 quantization error only


def test_library_nf4_quantizer_matches_oracle():
    """ops.bnb.nf4_quantize (the quantize direction, VERDICT r2 item 9 /
    reference METHOD.BITSANDBYTES) is bit-identical to the independent
    argmin oracle above."""
    from gptqmodel_tpu.ops.bnb import nf4_quantize

    rng = np.random.default_rng(3)
    W = rng.standard_normal((32, 128)).astype(np.float32) * 0.07
    packed_ref, absmax_ref, _ = _nf4_quantize_ref(W, blocksize=64)
    p = nf4_quantize(W, blocksize=64)
    np.testing.assert_array_equal(np.asarray(p.codes_u8), packed_ref)
    np.testing.assert_allclose(np.asarray(p.absmax), absmax_ref, rtol=0)
    # round trip
    back = np.asarray(dequantize_bnb4(p))
    rel = np.linalg.norm(back - W) / np.linalg.norm(W)
    assert rel < 0.15, rel


def test_nf4_quantize_save_reload_e2e():
    """Model-level quantize-to-nf4: GPTQModel.quantize(method=bitsandbytes)
    -> save -> reload through the bnb import path -> logits close to fp."""
    from tests.test_transformer import _tiny_llama_dir

    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        d, _ = _tiny_llama_dir(tmp, "llama", intermediate_size=128)
        fp = GPTQModel.load(d)
        fp._load_params()
        rng = np.random.default_rng(5)
        ids = rng.integers(1, 250, size=(2, 32))
        fp_logits = np.asarray(
            forward_logits(fp.spec, fp.params, jnp.asarray(ids))
        )

        m = GPTQModel.load(
            d, QuantizeConfig(method="bitsandbytes", group_size=64)
        )
        rows = m.quantize()  # calibration-free
        assert rows and all(not r["fallback"] for r in rows)
        q0 = m.params["model"]["layers"][0]["self_attn"]["q_proj"]
        assert isinstance(q0, Bnb4Linear)

        out = Path(tmp) / "nf4_q"
        m.save(out)
        m2 = GPTQModel.load(out)
        q_logits = np.asarray(
            forward_logits(m2.spec, m2.params, jnp.asarray(ids))
        )
        rel = np.linalg.norm(q_logits - fp_logits) / np.linalg.norm(fp_logits)
        assert rel < 0.25, rel
