"""EXL3 trellis quantization tests.

Coverage mirrors the reference test strategy (SURVEY §4): codebook decode
oracle values, pack/unpack bit-exact roundtrip, Viterbi validity +
quality, LDLQ end-to-end fidelity, runtime-forward parity against the
host reconstruction, and the looper/save/load lifecycle (test_e2e style).
"""

import numpy as np
import pytest

from gptqmodel_tpu.quantization.exl3 import (
    CODEBOOK_SCALE,
    block_ldl,
    codebook_table,
    dequantize_exl3,
    pack_trellis,
    prepare_exl3_hessian,
    quantize_exl3,
    tensor_core_perm,
    unpack_trellis,
    viterbi_quantize_tiles,
)


def _rand_valid_encoded(T: int, K: int, rng) -> np.ndarray:
    """Random TAIL-BITING trellis sequences: windows of a circular bitstream."""
    chunks = rng.integers(0, 1 << K, size=(T, 256), dtype=np.uint32)
    enc = np.zeros((T, 256), np.uint16)
    win = np.zeros(T, np.uint32)
    for lap in range(2):
        for t in range(256):
            win = ((win << K) | chunks[:, t]) & 0xFFFF
            if lap:
                enc[:, t] = win
    return enc


# ---------------------------------------------------------------- codebook


def test_codebook_known_values():
    # mcg at idx 0: hash=0 -> masked/xored to 0x3b603b60 -> fp16(0.921875)*2
    t = codebook_table("mcg")
    assert t.shape == (65536,)
    assert t[0] == np.float32(np.float16(0.921875) + np.float16(0.921875))
    # 3inst at idx 0: v = 64248484 = 0x03D46BA4
    v = ((0 * 89226354 + 64248484) & 0x8FFF8FFF) ^ 0x3B603B60
    lo = np.uint16(v & 0xFFFF).view(np.float16)
    hi = np.uint16(v >> 16).view(np.float16)
    assert codebook_table("3inst")[0] == np.float32(lo + hi)


@pytest.mark.parametrize("cb", ["3inst", "mcg", "mul1"])
def test_codebook_distribution(cb):
    t = codebook_table(cb)
    assert np.isfinite(t).all()
    # roughly centered, RMS near the published codebook scale (quantize.py:23)
    assert abs(float(t.mean())) < 0.1
    assert abs(float(np.sqrt((t**2).mean())) - CODEBOOK_SCALE) < 0.35


def test_tensor_core_perm_is_permutation():
    p = tensor_core_perm()
    assert sorted(p.tolist()) == list(range(256))


# ------------------------------------------------------------- pack/unpack


@pytest.mark.parametrize("K", [1, 2, 3, 4, 5, 6, 8])
def test_pack_unpack_roundtrip(K):
    rng = np.random.default_rng(K)
    enc = _rand_valid_encoded(5, K, rng)
    packed = pack_trellis(enc, K)
    assert packed.dtype == np.int16 and packed.shape == (5, 16 * K)
    out = unpack_trellis(packed, K)
    np.testing.assert_array_equal(out, enc)


# ----------------------------------------------------------------- viterbi


@pytest.mark.parametrize("K", [2, 4])
def test_viterbi_valid_and_better_than_random(K):
    rng = np.random.default_rng(0)
    tiles = rng.standard_normal((4, 256)).astype(np.float32)
    q, idx = viterbi_quantize_tiles(tiles, K, "mcg")
    table = codebook_table("mcg")
    # returned values decode from returned indices
    np.testing.assert_array_equal(q, table[idx])
    # trellis constraint: enc[t] low 16-K bits == enc[t+1] high 16-K bits,
    # circularly (tail-biting)
    Kr = 16 - K
    nxt = np.roll(idx.astype(np.uint32), -1, axis=1)
    np.testing.assert_array_equal(idx & ((1 << Kr) - 1), nxt >> K)
    mse = float(((q - tiles) ** 2).mean())
    rand_vals = table[rng.integers(0, 65536, size=tiles.shape)]
    rand_mse = float(((rand_vals - tiles) ** 2).mean())
    assert mse < 0.5 * rand_mse
    if K == 4:
        assert mse < 0.12  # ~QTIP 4bpw distortion on unit gaussian


# --------------------------------------------------------------- block LDL


def test_block_ldl_reconstructs():
    rng = np.random.default_rng(1)
    X = rng.standard_normal((256, 64)).astype(np.float64)
    H = X @ X.T / 64 + np.eye(256) * 0.5
    L = block_ldl(H.copy(), 16)
    # L (with identity diagonal blocks restored) satisfies H = L D L^T with
    # D the block diagonal of the Cholesky factors
    Lfull = L.astype(np.float64).copy()
    for i in range(16):
        s = slice(16 * i, 16 * (i + 1))
        Lfull[s, s] = np.eye(16)
    C = np.linalg.cholesky(H)
    D = np.zeros_like(H)
    for i in range(16):
        s = slice(16 * i, 16 * (i + 1))
        D[s, s] = C[s, s] @ C[s, s].T
    np.testing.assert_allclose(Lfull @ D @ Lfull.T, H, rtol=1e-4, atol=1e-6)


# ------------------------------------------------------------- end-to-end


def _toy_problem(k=128, n=128, rows=64, seed=0):
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    X = rng.standard_normal((rows, k)).astype(np.float32)
    X[:, : k // 4] *= 4.0  # correlated/outlier channels
    H = (X.T @ X) / rows
    return W, H


def test_quantize_exl3_fidelity_and_reconstruction():
    W, H = _toy_problem()
    H_data = prepare_exl3_hessian(H, seed=3)
    assert not H_data["q_fallback"]
    res = quantize_exl3(W, H_data, K=4, cb="mcg", skip_g_scale=True)
    # reconstruction from the packed artifact matches the replay weight
    # (suh/svh are stored fp16 -> ~1e-3 relative rounding vs the f64 replay)
    W_rec = dequantize_exl3(res.trellis, res.suh, res.svh, 4, "mcg")
    np.testing.assert_allclose(W_rec, res.Wq, rtol=5e-3, atol=5e-4)
    # 4bpw on a gaussian weight: relative error well under 10%
    rel = np.linalg.norm(res.Wq - W) / np.linalg.norm(W)
    assert rel < 0.10, rel
    assert 0 <= res.proxy_err < 0.02, res.proxy_err


def test_quantize_exl3_fallback_no_hessian():
    W, _ = _toy_problem()
    H_data = prepare_exl3_hessian(np.zeros((128, 128), np.float32), seed=0)
    assert H_data["q_fallback"]
    res = quantize_exl3(W, H_data, K=4, cb="mcg", skip_g_scale=True)
    rel = np.linalg.norm(res.Wq - W) / np.linalg.norm(W)
    assert rel < 0.15, rel


def test_ldlq_beats_fallback_on_correlated_hessian():
    W, H = _toy_problem(seed=7)
    Hd = prepare_exl3_hessian(H, seed=7)
    res_ldl = quantize_exl3(W, Hd, K=2, cb="mcg", skip_g_scale=True)
    Hd0 = prepare_exl3_hessian(np.zeros_like(H), seed=7)
    res_rtn = quantize_exl3(W, Hd0, K=2, cb="mcg", skip_g_scale=True)

    def proxy(Wq):
        E = Wq - W
        return float(np.sum(E * (H @ E)))

    assert proxy(res_ldl.Wq) < proxy(res_rtn.Wq)


# ------------------------------------------------------------ runtime path


def test_trellis_linear_forward_matches_dequant():
    import jax.numpy as jnp

    from gptqmodel_tpu.ops.trellis import (
        make_trellis_linear,
        post_init_trellis,
        trellis_dequantize,
        trellis_forward,
    )

    W, H = _toy_problem(k=128, n=256)
    H_data = prepare_exl3_hessian(H, seed=5)
    res = quantize_exl3(W, H_data, K=3, cb="3inst", skip_g_scale=True)
    p = make_trellis_linear(
        trellis=res.trellis, suh=res.suh, svh=res.svh, bias=None, K=3,
        cb="3inst",
    )
    # jit decode == host decode
    W_rt = np.asarray(trellis_dequantize(p))
    W_host = dequantize_exl3(res.trellis, res.suh, res.svh, 3, "3inst")
    np.testing.assert_allclose(W_rt, W_host, rtol=1e-4, atol=1e-5)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
    y = np.asarray(trellis_forward(p, x))
    y_ref = np.asarray(x) @ W_host
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=1e-3)
    # post-init cached path (bf16 W~) stays close
    p2 = post_init_trellis(p)
    y2 = np.asarray(trellis_forward(p2, x))
    assert np.max(np.abs(y2 - y_ref)) < 0.05 * max(1.0, np.max(np.abs(y_ref)))


# ----------------------------------------------------------- e2e lifecycle


def test_exl3_quantize_save_reload():
    """Looper lifecycle with method=exl3: quantize a 128-wide tiny llama,
    save (exllamav3 tensor layout), reload, and check logits fidelity —
    reference ModelTest pattern."""
    import tempfile
    from pathlib import Path

    import jax.numpy as jnp

    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits
    from gptqmodel_tpu.ops.trellis import TrellisLinear

    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="llama", vocab_size=256, hidden_size=128,
            intermediate_size=256, num_hidden_layers=1,
            num_attention_heads=4, num_key_value_heads=4,
            max_position_embeddings=256, tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        model = AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval()
        src = Path(tmp) / "tiny"
        model.save_pretrained(src, safe_serialization=True)

        rng = np.random.default_rng(0)
        calib = [rng.integers(1, 256, size=(64,)) for _ in range(12)]
        eval_ids = np.stack([rng.integers(1, 256, size=(48,)) for _ in range(4)])

        fp = GPTQModel.load(src)
        fp._load_params()
        fp_logits = np.asarray(
            forward_logits(fp.spec, fp.params, jnp.asarray(eval_ids))
        )

        m = GPTQModel.load(src, QuantizeConfig(method="exl3", bits=4))
        rows = m.quantize(calib, batch_size=4)
        assert len(rows) == 1 * 7
        assert all(r["group_size"] == -1 for r in rows)
        q_logits = np.asarray(forward_logits(m.spec, m.params, jnp.asarray(eval_ids)))
        rel = float(np.linalg.norm(q_logits - fp_logits) / np.linalg.norm(fp_logits))
        assert rel < 0.25, f"exl3 logits diverged: {rel}"

        out = Path(tmp) / "quantized"
        m.save(out)
        import json

        qc = json.loads((out / "quantize_config.json").read_text())
        assert qc["quant_method"] == "exl3"
        assert qc["checkpoint_format"] == "exl3"
        assert qc["codebook"] == "mcg"

        m2 = GPTQModel.load(out)
        assert m2.quantized

        def walk(t):
            if isinstance(t, TrellisLinear):
                yield t
            elif isinstance(t, dict):
                for v in t.values():
                    yield from walk(v)
            elif isinstance(t, list):
                for v in t:
                    yield from walk(v)

        mods = [x for lp in m2.params["model"]["layers"] for x in walk(lp)]
        assert len(mods) == 7
        assert all(p.K == 4 and p.cb == "mcg" for p in mods)
        r_logits = np.asarray(
            forward_logits(m2.spec, m2.params, jnp.asarray(eval_ids))
        )
        # replay weights carry f64-precision su/sv; the checkpoint stores
        # them fp16 (reference suh/svh are half too) -> ~1e-3 reconstruction
        # rounding through two matmul layers
        np.testing.assert_allclose(r_logits, q_logits, rtol=2e-2, atol=5e-3)
