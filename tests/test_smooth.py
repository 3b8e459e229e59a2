"""Failsafe weight smoothing tests (reference SmoothMethods analog)."""

import tempfile

import numpy as np

from gptqmodel_tpu.quantization.smooth import smooth_weight


def test_percentile_clip_tames_outliers():
    rng = np.random.default_rng(0)
    W = rng.standard_normal((16, 64)).astype(np.float32) * 0.05
    W[0, 0] = 5.0
    Ws, rs = smooth_weight(W, "percentile", group_size=32, percentile=95.0)
    assert rs is None
    assert np.abs(Ws[0, 0]) < 1.0
    # non-outlier mass barely changes
    assert np.abs(Ws[1:] - W[1:]).max() < np.percentile(np.abs(W[1:]), 99)


def test_mad_clip():
    rng = np.random.default_rng(1)
    W = rng.standard_normal((8, 64)).astype(np.float32)
    W[2, 5] = 50.0
    Ws, _ = smooth_weight(W, "mad", group_size=-1, mad_k=4.0)
    assert np.abs(Ws[2, 5]) < 10.0
    np.testing.assert_allclose(Ws[0], W[0], atol=1e-6)  # clean rows untouched


def test_rms_row_exact_fold():
    rng = np.random.default_rng(2)
    W = rng.standard_normal((8, 32)).astype(np.float32) * np.logspace(
        -2, 1, 8
    )[:, None].astype(np.float32)
    Ws, rs = smooth_weight(W, "rms_row", group_size=32)
    assert rs.shape == (1, 8)  # [n_groups, out]
    np.testing.assert_allclose(Ws * rs.T, W, rtol=1e-6)
    # rows now comparable magnitude
    rms = np.sqrt((Ws**2).mean(1))
    np.testing.assert_allclose(rms, 1.0, rtol=1e-5)


def test_rowcol_per_chunk_fold():
    rng = np.random.default_rng(7)
    W = rng.standard_normal((4, 128)).astype(np.float32)
    Ws, rs = smooth_weight(W, {"type": "rowcol", "axis": "row"}, group_size=32)
    assert rs.shape == (4, 4)  # [n_groups, out]
    np.testing.assert_allclose(Ws * np.repeat(rs.T, 32, axis=1), W, rtol=1e-6)


def test_failsafe_smooth_quality_on_outlier_weights():
    """RTN fallback with rms_row smoothing beats plain RTN when rows have
    wildly different magnitudes... rows are independently scaled in RTN
    already (per-group params), so instead verify the e2e plumbing: a MoE
    model with dead experts quantizes under fallback_smooth and reloads."""
    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from tests.test_e2e_quantize import _calib, _make_tiny

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(
            tmp, "qwen3_moe",
            num_experts=4, num_experts_per_tok=1, moe_intermediate_size=32,
            decoder_sparse_step=1, norm_topk_prob=True, head_dim=16,
            mlp_only_layers=[], num_hidden_layers=1,
        )
        m = GPTQModel.load(
            src,
            QuantizeConfig(
                bits=4, group_size=32, fallback_min_samples=10_000,
                fallback_smooth="percentile",
            ),
        )
        rows = m.quantize(_calib(8, 32), batch_size=4)
        assert all(r["fallback"] for r in rows)  # everything under-calibrated
        out = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=3,
                         dtype=__import__("jax.numpy", fromlist=["x"]).float32)
        assert out.shape == (1, 3)


def test_model_wide_smoother_preprocessor():
    """qcfg.smooth applies the Smoother to every module pre-solve (reference
    SmootherConfig + module_preprocessor plan) and stays load/generate-able,
    including the rowcol scale fold through the GPTQ solver."""
    import jax.numpy as jnp

    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits
    from tests.test_e2e_quantize import _calib, _fidelity, _make_tiny

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        calib = _calib(8, 32)
        eval_ids = np.stack(_calib(2, 24, seed=9))

        fp = GPTQModel.load(src)
        fp._load_params()
        fp_logits = np.asarray(
            forward_logits(fp.spec, fp.params, jnp.asarray(eval_ids)))

        for smooth in ({"type": "percentile", "percentile": 99.5},
                       {"type": "rowcol", "axis": "row"}):
            m = GPTQModel.load(src, QuantizeConfig(
                bits=4, group_size=32, smooth=smooth, smooth_group_threshold=0))
            rows = m.quantize(calib, batch_size=4)
            assert len(rows) == 2 * 7
            q = np.asarray(
                forward_logits(m.spec, m.params, jnp.asarray(eval_ids)))
            assert _fidelity(q, fp_logits) < 0.15, smooth

        # threshold gate: group_size 32 < 128 -> smoother inert, results equal
        # to a plain run
        a = GPTQModel.load(src, QuantizeConfig(bits=4, group_size=32))
        b = GPTQModel.load(src, QuantizeConfig(
            bits=4, group_size=32, smooth={"type": "mad", "k": 2.75}))
        ra = a.quantize(calib, batch_size=4)
        rb = b.quantize(calib, batch_size=4)
        np.testing.assert_allclose(
            [r["loss"] for r in ra], [r["loss"] for r in rb])


def test_mse_smoother_inherits_bits():
    """smooth='mse' fake-quant must use the MODULE's bits, not a fixed 4."""
    import jax.numpy as jnp

    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from tests.test_e2e_quantize import _calib, _make_tiny

    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        calib = _calib(8, 32)
        m8 = GPTQModel.load(src, QuantizeConfig(
            bits=8, group_size=32, smooth="mse", smooth_group_threshold=0))
        rows8 = m8.quantize(calib, batch_size=4)
        m4 = GPTQModel.load(src, QuantizeConfig(
            bits=4, group_size=32, smooth="mse", smooth_group_threshold=0))
        rows4 = m4.quantize(calib, batch_size=4)
        # 8-bit smoothing+quant must be far more faithful than 4-bit: if the
        # smoother hard-coded 4 bits, the 8-bit losses would be 4-bit-sized
        l8 = np.mean([r["loss"] for r in rows8])
        l4 = np.mean([r["loss"] for r in rows4])
        assert l8 < l4 / 4, (l8, l4)
