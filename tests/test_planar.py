"""Planar (gptq_p) split-plane format tests.

Models the reference's planar coverage (docs/gptq_planar.md,
utils/planar_packing.py): word-aligned bit planes for 5/6/7-bit (and the
optional planar layout at 2/3/4/8), v2-only zeros, bit-identity of
single-plane widths with the continuous layout, and the reference torch
implementation as a packed-words oracle.
"""

import tempfile
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from gptqmodel_tpu.ops import pack as packing


@pytest.mark.parametrize("bits", [2, 3, 4, 5, 6, 7, 8])
def test_planar_roundtrip(bits):
    rng = np.random.default_rng(bits)
    codes = rng.integers(0, 2**bits, size=(64, 12), dtype=np.uint32)
    packed = packing.planar_pack_axis0(codes, bits)
    assert packed.shape == (64 * bits // 32, 12)
    assert packed.dtype == np.int32
    out = packing.planar_unpack_axis0(packed, bits)
    np.testing.assert_array_equal(out, codes.astype(np.int32))
    # jnp twin
    out_j = np.asarray(packing.planar_unpack_axis0_jnp(jnp.asarray(packed), bits))
    np.testing.assert_array_equal(out_j, codes.astype(np.int32))


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_planar_single_plane_bit_identical_to_continuous(bits):
    """Spec: single-plane widths produce words bit-identical to the
    continuous layout (docs/gptq_planar.md)."""
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 2**bits, size=(64, 8), dtype=np.uint32)
    np.testing.assert_array_equal(
        packing.planar_pack_axis0(codes, bits),
        packing.pack_qweight(codes, bits),
    )


@pytest.mark.parametrize("bits", [3, 5, 6, 7])
def test_planar_matches_reference_oracle(bits):
    """Packed words must match the reference torch implementation exactly
    (checkpoint interchange)."""
    import importlib.util

    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_planar", "/root/reference/gptqmodel/utils/planar_packing.py"
    )
    ref = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(ref)
    except Exception:
        pytest.skip("reference planar oracle unavailable")
    planar_pack_rows = ref.planar_pack_rows
    planar_unpack_rows = ref.planar_unpack_rows
    rng = np.random.default_rng(bits)
    codes = rng.integers(0, 2**bits, size=(96, 6), dtype=np.int64)
    ours = packing.planar_pack_axis0(codes.astype(np.uint32), bits)
    theirs = planar_pack_rows(torch.tensor(codes), bits).numpy()
    np.testing.assert_array_equal(ours, theirs)
    back = planar_unpack_rows(torch.tensor(ours), bits).numpy()
    np.testing.assert_array_equal(back, codes.astype(np.int32))


@pytest.mark.parametrize("bits", [5, 6, 7])
def test_planar_e2e_quantize_reload(bits):
    """5/6/7-bit auto-route to gptq_p; save/reload must be bit-exact and
    higher widths must beat 4-bit fidelity."""
    from tests.test_e2e_quantize import _calib, _make_tiny
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits
    from gptqmodel_tpu.quantization.config import FORMAT

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        qcfg = QuantizeConfig(bits=bits, group_size=32)
        assert qcfg.format == FORMAT.GPTQ_P
        m = GPTQModel.load(src, qcfg)
        m.quantize(_calib(8), batch_size=4)
        lp0 = m.params["model"]["layers"][0]
        assert lp0["self_attn"]["q_proj"].planar

        eval_ids = jnp.asarray(np.stack(_calib(2, 32, seed=7)))
        a = np.asarray(forward_logits(m.spec, m.params, eval_ids))
        out = Path(tmp) / "q"
        m.save(out)
        import json

        cfg = json.loads((out / "quantize_config.json").read_text())
        assert cfg["checkpoint_format"] == "gptq_p"
        m2 = GPTQModel.load(out)
        b = np.asarray(forward_logits(m2.spec, m2.params, eval_ids))
        np.testing.assert_allclose(b, a, atol=1e-5)


def test_planar_beats_4bit_quality():
    from tests.test_e2e_quantize import _calib, _fidelity, _make_tiny
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        eval_ids = jnp.asarray(np.stack(_calib(2, 48, seed=3)))
        fp = GPTQModel.load(src)
        fp._load_params()
        fp_logits = np.asarray(forward_logits(fp.spec, fp.params, eval_ids))
        errs = {}
        for bits in (4, 6):
            m = GPTQModel.load(src, QuantizeConfig(bits=bits, group_size=32))
            m.quantize(_calib(8), batch_size=4)
            errs[bits] = _fidelity(
                np.asarray(forward_logits(m.spec, m.params, eval_ids)), fp_logits
            )
        assert errs[6] < errs[4], errs
