"""Quantized ragged-MoE kernel vs the dense dequant reference (interpret
mode on the CPU mesh — same validation pattern as test_pallas_qmatmul)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gptqmodel_tpu.ops import pack as packing
from gptqmodel_tpu.ops.pallas_qmatmul import _plane_permute_x
from gptqmodel_tpu.ops.pallas_qmoe import build_slots, qmoe_matmul


def _make_expert(rng, K, N, bits, g):
    Q = rng.integers(0, 2**bits, size=(N, K), dtype=np.int32)
    G = K // g
    scales = (rng.random((G, N), np.float32) * 0.02 + 0.01).astype(np.float32)
    zero = 2 ** (bits - 1)
    W = (Q.T - zero).astype(np.float32) * np.repeat(scales, g, axis=0)  # [K,N]
    qw = packing.pack_qweight(np.ascontiguousarray(Q.T), bits)
    return qw, scales, W


@pytest.mark.parametrize("bits,K,N,g", [(4, 256, 256, 128), (8, 256, 384, 128),
                                        (4, 256, 384, 128)])
def test_qmoe_matches_dense(bits, K, N, g):
    rng = np.random.default_rng(0)
    E, tokens, topk = 4, 6, 2
    experts = [_make_expert(rng, K, N, bits, g) for _ in range(E)]
    qw_stacked = jnp.asarray(np.stack([e[0] for e in experts]))
    G = K // g
    G_pad = max(8, -(-G // 8) * 8)
    s_pad = np.zeros((E, G_pad, N), np.float32)
    for i, e in enumerate(experts):
        s_pad[i, :G] = e[1]
    s_stacked = jnp.asarray(s_pad.astype(jnp.bfloat16))

    x = rng.standard_normal((tokens, K)).astype(np.float32)
    top_i = rng.integers(0, E, size=(tokens, topk))
    top_w = rng.random((tokens, topk)).astype(np.float32)

    bm = 8
    M_tot = tokens * topk
    max_slots = M_tot // bm + E + 1
    pos, ids, counts, order = build_slots(top_i, E, bm, max_slots)
    M_pad = max_slots * bm
    xs = np.zeros((M_pad, K), np.float32)
    xs[pos] = x[order // topk]
    xp = _plane_permute_x(jnp.asarray(xs, jnp.bfloat16), K, 32 // bits, bits)

    y_pad = np.asarray(qmoe_matmul(
        xp, jnp.asarray(ids), jnp.asarray(counts),
        qw_stacked, s_stacked, bits=bits, G=G, bm=bm,
        zero_const=float(2 ** (bits - 1)), interpret=True,
    ))
    y_sorted = y_pad[pos]

    # dense reference: per (token, k) pick, y += w * (x @ W_e)
    ref = np.zeros((tokens, N), np.float32)
    for t in range(tokens):
        for kk in range(topk):
            e = int(top_i[t, kk])
            ref[t] += top_w[t, kk] * (
                x[t].astype(np.float32) @ experts[e][2]
            )
    # reassemble from sorted rows
    out = np.zeros((tokens, N), np.float32)
    flat_w = top_w.reshape(-1)[order]
    for r in range(M_tot):
        out[order[r] // topk] += flat_w[r] * y_sorted[r]
    # padding rows (not covered by any slot count) are zero
    mask = np.ones(M_pad, bool)
    mask[pos] = False
    assert np.all(y_pad[mask] == 0.0)

    # bf16 x & scales: row-normalized error (near-zero elements otherwise
    # dominate a pointwise relative metric)
    rel = np.abs(out - ref).max(axis=1) / (np.abs(ref).max(axis=1) + 1e-6)
    assert rel.max() < 0.02, rel.max()



def test_build_slots_plan():
    top_i = np.array([[0, 2], [2, 2], [1, 2], [2, 0]])
    pos, ids, counts, order = build_slots(top_i, E=4, bm=2, max_slots=8)
    sorted_e = top_i.reshape(-1)[order]
    assert (np.sort(sorted_e) == sorted_e).all()
    # every sorted row lands inside its slot's [s*bm, s*bm+count) range with
    # the right expert; no two rows collide
    assert len(set(pos.tolist())) == len(pos)
    for r, p_ in enumerate(pos):
        s_ = p_ // 2
        assert ids[s_] == sorted_e[r]
        assert p_ - s_ * 2 < counts[s_]


def test_plan_slots_jit_matches_host():
    import jax.numpy as jnp

    from gptqmodel_tpu.ops.pallas_qmoe import plan_slots_jit

    rng = np.random.default_rng(3)
    top_i = rng.integers(0, 5, size=(7, 3))
    bm = 4
    S = (21 // bm) + 5 + 1
    pos_h, ids_h, counts_h, order = build_slots(top_i, 5, bm, S)
    flat_sorted = jnp.asarray(top_i.reshape(-1)[order])
    ids_j, counts_j, pos_j = plan_slots_jit(flat_sorted, 5, bm, S)
    np.testing.assert_array_equal(np.asarray(counts_j), counts_h)
    np.testing.assert_array_equal(np.asarray(pos_j), pos_h)
    # expert ids must agree on every slot with rows
    live = counts_h > 0
    np.testing.assert_array_equal(np.asarray(ids_j)[live], ids_h[live])


def test_qmoe_e2e_optimize_matches_loop():
    """quantize tiny qwen3_moe -> reload -> stack packed experts -> the
    jit-safe slot-planned kernel path must match the dense expert loop.
    Runs the kernel in interpret mode (CPU mesh)."""
    import tempfile
    from pathlib import Path

    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits
    from gptqmodel_tpu.ops import registry

    with tempfile.TemporaryDirectory() as tmp:
        cfg = AutoConfig.for_model(
            model_type="qwen3_moe", vocab_size=128, hidden_size=128,
            intermediate_size=128, num_hidden_layers=1,
            num_attention_heads=4, num_key_value_heads=2, head_dim=32,
            num_experts=4, num_experts_per_tok=2, moe_intermediate_size=128,
            decoder_sparse_step=1, norm_topk_prob=True, mlp_only_layers=[],
            max_position_embeddings=256, tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(torch.float32).eval(
        ).save_pretrained(Path(tmp) / "m", safe_serialization=True)
        rng = np.random.default_rng(0)
        m = GPTQModel.load(Path(tmp) / "m", QuantizeConfig(bits=4, group_size=128))
        m.quantize([rng.integers(1, 128, size=(48,)) for _ in range(8)],
                   batch_size=4)
        out_dir = Path(tmp) / "q"
        m.save(out_dir)

        m2 = GPTQModel.load(out_dir)
        ids = np.stack([rng.integers(1, 128, size=(16,)) for _ in range(2)])
        ref_logits = np.asarray(
            forward_logits(m2.spec, m2.params, jnp.asarray(ids))
        )
        registry.set_backend("pallas_interpret")
        try:
            m2.optimize(fused_mlp=False)
            lp0 = m2.params["model"]["layers"][0]
            assert "experts_stacked_q" in lp0["mlp"], list(lp0["mlp"])
            q_logits = np.asarray(
                forward_logits(m2.spec, m2.params, jnp.asarray(ids))
            )
        finally:
            registry.set_backend("auto")
        rel = np.abs(q_logits - ref_logits).max() / (
            np.abs(ref_logits).max() + 1e-6
        )
        assert rel < 0.03, rel


def test_packed_dense_fallback_matches_kernel_path():
    """Large-token dispatches (prefill) route through the per-expert dense
    fallback — must match the decode-shaped qmoe kernel path numerically."""
    import jax

    from gptqmodel_tpu.models import transformer as tr
    from gptqmodel_tpu.models.spec import ModelSpec
    from gptqmodel_tpu.ops.pallas_qmoe import StackedQuantExperts
    from gptqmodel_tpu.ops import registry

    rng = np.random.default_rng(5)
    E, D, F, topk, bits, g = 4, 256, 128, 2, 4, 128
    spec = ModelSpec(
        model_type="qwen3_moe", hidden_size=D, intermediate_size=F,
        num_layers=1, num_heads=4, num_kv_heads=2, head_dim=64,
        vocab_size=64, num_experts=E, num_experts_per_tok=topk,
        moe_intermediate_size=F, norm_topk_prob=True,
    )

    def stacked(K, N):
        experts = [_make_expert(rng, K, N, bits, g) for _ in range(E)]
        G = K // g
        G_pad = max(8, -(-G // 8) * 8)
        s_pad = np.zeros((E, G_pad, N), np.float32)
        for i, e in enumerate(experts):
            s_pad[i, :G] = e[1]
        return StackedQuantExperts(
            qweight=jnp.asarray(np.stack([e[0] for e in experts])),
            scales=jnp.asarray(s_pad.astype(jnp.bfloat16)),
            bits=bits, G=G, zero_const=float(2 ** (bits - 1)),
            in_features=K, out_features=N,
        )

    sq = {"gate": stacked(D, F), "up": stacked(D, F), "down": stacked(F, D)}
    tokens = 16
    x = jnp.asarray(rng.standard_normal((tokens, D)).astype(np.float32))
    # distinct experts per token (real top-k never duplicates; the scatter
    # in the fallback would SET where the ragged path ADDS)
    top_i = jnp.asarray(
        np.argsort(rng.random((tokens, E)), axis=1)[:, :topk].astype(np.int32))
    top_w = jnp.asarray(rng.random((tokens, topk)).astype(np.float32))

    registry.set_backend("pallas_interpret")
    try:
        small = np.asarray(tr._moe_ragged_apply_q(spec, sq, x, top_w, top_i))
    finally:
        registry.set_backend("auto")
    fallback = np.asarray(tr._moe_packed_dense_fallback(spec, sq, x, top_w, top_i))
    np.testing.assert_allclose(fallback, small, rtol=5e-2, atol=5e-2)  # bf16 path-order

    # threshold wiring: a dispatch over _QMOE_MAX_TOKENS uses the fallback
    assert tr._QMOE_MAX_TOKENS * 1 < 4096
    big_x = jnp.tile(x, (256, 1))  # 4096 tokens x topk 2 > threshold
    big_i = jnp.tile(top_i, (256, 1))
    big_w = jnp.tile(top_w, (256, 1))
    out_big = np.asarray(tr._moe_ragged_apply_q(spec, sq, big_x, big_w, big_i))
    np.testing.assert_allclose(out_big[:tokens], fallback, rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("bits,D,F,g", [(4, 256, 384, 128), (8, 256, 256, 128),
                                        (4, 2048, 768, 128)])
def test_fused_slot_mlp_matches_three_kernel_path(bits, D, F, g):
    """qmoe_mlp (gate|up + act·mul + down in one launch) vs the 3-call
    dispatch — same slot plan, interpret mode."""
    import jax

    from gptqmodel_tpu.ops.pallas_qmoe import (
        StackedQuantExperts,
        fuse_gate_up,
        qmoe_forward_sorted,
        qmoe_mlp_forward_sorted,
        qmoe_mlp_supported,
    )

    rng = np.random.default_rng(1)
    E, tokens, topk, bm = 4, 6, 2, 8

    def stack(K, N):
        exps = [_make_expert(rng, K, N, bits, g) for _ in range(E)]
        G = K // g
        G_pad = max(8, -(-G // 8) * 8)
        s_pad = np.zeros((E, G_pad, N), np.float32)
        for i, e in enumerate(exps):
            s_pad[i, :G] = e[1]
        return StackedQuantExperts(
            qweight=jnp.asarray(np.stack([e[0] for e in exps])),
            scales=jnp.asarray(s_pad.astype(jnp.bfloat16)),
            bits=bits, G=G, zero_const=float(2 ** (bits - 1)),
            in_features=K, out_features=N,
        )

    gate, up, down = stack(D, F), stack(D, F), stack(F, D)
    gu = fuse_gate_up(gate, up)
    assert gu is not None
    assert qmoe_mlp_supported(
        bits=bits, D=D, F=F, G_gu=gu.G, G_d=down.G,
        M_pad=(tokens * topk // bm + E + 1) * bm, act="silu",
    )

    top_i = rng.integers(0, E, size=(tokens, topk))
    x = rng.standard_normal((tokens, D)).astype(np.float32)
    max_slots = tokens * topk // bm + E + 1
    pos, ids, counts, order = build_slots(top_i, E, bm, max_slots)
    M_pad = max_slots * bm
    xs = np.zeros((M_pad, D), np.float32)
    xs[pos] = x[order // topk]
    xs = jnp.asarray(xs, jnp.bfloat16)
    ids_j, counts_j = jnp.asarray(ids), jnp.asarray(counts)

    # 3-call reference path
    both = qmoe_forward_sorted(xs, ids_j, counts_j, gu, bm=bm, interpret=True)
    gacc, uacc = both[:, :F], both[:, F:]
    inner = (jax.nn.silu(gacc) * uacc).astype(jnp.bfloat16)
    y_ref = np.asarray(
        qmoe_forward_sorted(inner, ids_j, counts_j, down, bm=bm,
                            interpret=True)
    )

    y_fused = np.asarray(
        qmoe_mlp_forward_sorted(xs, ids_j, counts_j, gu, down, act="silu",
                                bm=bm, interpret=True)
    )
    # identical math modulo the bf16 round of the inner intermediate (the
    # 3-call path also rounds inner to bf16 before the down kernel)
    rel = np.linalg.norm(y_fused - y_ref) / (np.linalg.norm(y_ref) + 1e-9)
    assert rel < 2e-2, rel
    # empty slots stay zero
    dead = counts == 0
    assert np.all(y_fused.reshape(max_slots, bm, -1)[dead] == 0.0)


def _stacked_random(rng, E, K, N, bits, g):
    import jax

    from gptqmodel_tpu.ops.pallas_qmoe import StackedQuantExperts

    G = K // g
    G_pad = max(8, -(-G // 8) * 8)
    sc = np.zeros((E, G_pad, N), np.float32)
    sc[:, :G] = rng.uniform(0.005, 0.02, (E, G, N))
    return StackedQuantExperts(
        qweight=jax.lax.bitcast_convert_type(
            jax.random.bits(jax.random.PRNGKey(K * 7 + N),
                            (E, K // (32 // bits), N), dtype=jnp.uint32),
            jnp.int32),
        scales=jnp.asarray(sc, jnp.bfloat16),
        bits=bits, G=G, zero_const=float(2 ** (bits - 1)),
        in_features=K, out_features=N,
    )


def test_dyn_slot_mlp_bit_exact_vs_grid():
    """The dynamic-trip-count fused MLP (manual double-buffered DMA, used
    slots only) must be BIT-EXACT vs the static slot-grid kernel — same
    _ic_contract math, different scheduling (session Z/Z2)."""
    from gptqmodel_tpu.ops.pallas_qmoe import (
        fuse_gate_up, qmoe_mlp_forward_sorted,
    )

    rng = np.random.default_rng(3)
    bits, g, E, D, F = 4, 128, 8, 256, 256
    tokens, topk, bm = 8, 2, 8
    gu = fuse_gate_up(_stacked_random(rng, E, D, F, bits, g),
                      _stacked_random(rng, E, D, F, bits, g))
    down = _stacked_random(rng, E, F, D, bits, g)
    top_i = rng.integers(0, E, size=(tokens, topk))
    S = tokens * topk // bm + min(E, tokens * topk)
    pos, ids, counts, order = build_slots(top_i, E, bm, S)
    x = rng.standard_normal((tokens, D)).astype(np.float32) * 0.5
    xs = np.zeros((S * bm, D), np.float32)
    xs[pos] = x[order // topk]
    xs = jnp.asarray(xs, jnp.bfloat16)
    args = (xs, jnp.asarray(ids), jnp.asarray(counts), gu, down)
    y_grid = np.asarray(qmoe_mlp_forward_sorted(
        *args, act="silu", bm=bm, interpret=True, dyn=False), np.float32)
    y_dyn = np.asarray(qmoe_mlp_forward_sorted(
        *args, act="silu", bm=bm, interpret=True, dyn=True), np.float32)
    assert np.array_equal(y_grid, y_dyn)


def test_e2e_layer_kernel_matches_composed_path():
    """qmoe_mlp_forward_e2e (in-kernel gather + MLP + weighted combine)
    must be BIT-EXACT vs the composed path (slot scatter -> fused slot
    kernel -> gather/weight/scatter-add) when fed the same bf16-rounded
    inputs — identical math, the HBM slot buffers just never exist."""
    import jax

    from gptqmodel_tpu.ops.pallas_qmoe import (
        fuse_gate_up, qmoe_mlp_forward_e2e, qmoe_mlp_forward_sorted,
    )

    rng = np.random.default_rng(4)
    bits, g, E, D, F = 4, 128, 8, 256, 256
    tokens, topk, bm = 8, 2, 8
    gu = fuse_gate_up(_stacked_random(rng, E, D, F, bits, g),
                      _stacked_random(rng, E, D, F, bits, g))
    down = _stacked_random(rng, E, F, D, bits, g)
    top_i = rng.integers(0, E, size=(tokens, topk))
    top_w = rng.uniform(0.1, 1.0, (tokens, topk)).astype(np.float32)
    M = tokens * topk
    S = M // bm + min(E, M)
    pos, ids, counts, order = build_slots(top_i, E, bm, S)
    tok = order // topk
    w_sorted = top_w.reshape(-1)[order]
    x = (rng.standard_normal((tokens, D)) * 0.5).astype(np.float32)
    xb = np.asarray(jnp.asarray(x, jnp.bfloat16).astype(jnp.float32))

    xs = np.zeros((S * bm, D), np.float32)
    xs[pos] = xb[tok]
    y = np.asarray(qmoe_mlp_forward_sorted(
        jnp.asarray(xs, jnp.bfloat16), jnp.asarray(ids), jnp.asarray(counts),
        gu, down, act="silu", bm=bm, interpret=True, dyn=False), np.float32)
    ref = np.zeros((tokens, D), np.float32)
    np.add.at(ref, tok, y[pos] * w_sorted[:, None])

    out = np.asarray(qmoe_mlp_forward_e2e(
        jnp.asarray(xb), jnp.asarray(pos), jnp.asarray(tok),
        jnp.asarray(w_sorted), jnp.asarray(ids), jnp.asarray(counts),
        gu, down, act="silu", bm=bm, interpret=True))
    assert np.array_equal(ref, out)


def test_plan_rows_jit_matches_sorted_plan():
    """Sort-free placement == stable argsort + plan_slots_jit: the scatter
    targets (tok_col/w_col) and slot tables must be identical."""
    from gptqmodel_tpu.ops.pallas_qmoe import plan_rows_jit, plan_slots_jit

    rng = np.random.default_rng(11)
    for E, tokens, topk, bm in [(8, 8, 2, 8), (128, 8, 8, 8), (16, 12, 4, 8)]:
        M = tokens * topk
        S = M // bm + min(E, M)
        top_i = rng.integers(0, E, size=(tokens, topk))
        top_w = rng.random((tokens, topk)).astype(np.float32)
        flat_e = jnp.asarray(top_i.reshape(-1))

        order = np.argsort(top_i.reshape(-1), kind="stable")
        ids_s, counts_s, pos_s = plan_slots_jit(
            jnp.asarray(top_i.reshape(-1)[order]), E, bm, S)
        ids_r, counts_r, row_pos = plan_rows_jit(flat_e, E, bm, S)
        assert np.array_equal(np.asarray(ids_s), np.asarray(ids_r))
        assert np.array_equal(np.asarray(counts_s), np.asarray(counts_r))

        M_pad = S * bm
        tok_a = np.full(M_pad, -1, np.int64)
        tok_a[np.asarray(pos_s)] = order // topk
        w_a = np.zeros(M_pad, np.float32)
        w_a[np.asarray(pos_s)] = top_w.reshape(-1)[order]
        tok_b = np.full(M_pad, -1, np.int64)
        tok_b[np.asarray(row_pos)] = np.arange(M) // topk
        w_b = np.zeros(M_pad, np.float32)
        w_b[np.asarray(row_pos)] = top_w.reshape(-1)
        assert np.array_equal(tok_a, tok_b)
        assert np.array_equal(w_a, w_b)


def test_topk_iterative_matches_lax():
    """transformer._topk (argmax rounds) == lax.top_k on routing shapes,
    including first-occurrence tie order."""
    import os

    import jax
    import jax.numpy as jnp

    from gptqmodel_tpu.models.transformer import _topk

    os.environ["GPTQ_TPU_ITER_TOPK"] = "1"  # opt-in path under test
    rng = np.random.default_rng(5)
    for shape, k in [((8, 128), 8), ((64, 16), 2), ((3, 7, 32), 4)]:
        x = rng.standard_normal(shape).astype(np.float32)
        # inject ties
        x[..., 3] = x[..., 1]
        v_ref, i_ref = jax.lax.top_k(jnp.asarray(x), k)
        v, i = _topk(jnp.asarray(x), k)
        assert np.array_equal(np.asarray(v_ref), np.asarray(v))
        assert np.array_equal(np.asarray(i_ref), np.asarray(i))
    # large k falls back to lax.top_k verbatim
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    v, i = _topk(x, 32)
    v_ref, i_ref = jax.lax.top_k(x, 32)
    assert np.array_equal(np.asarray(v_ref), np.asarray(v))
    os.environ.pop("GPTQ_TPU_ITER_TOPK", None)


def test_e2e_prefill_size_matches_dense_fallback():
    """Prefill-size dispatch (M > 1024) through the e2e kernel with raised
    bm must match the dense all-expert fallback (the old prefill path) —
    same routing, same weights, bf16-level tolerance."""
    import os

    import jax.numpy as jnp

    from gptqmodel_tpu.models.spec import ModelSpec
    from gptqmodel_tpu.models import transformer as tr
    from gptqmodel_tpu.ops import registry
    from gptqmodel_tpu.ops.pallas_qmoe import fuse_gate_up

    rng = np.random.default_rng(6)
    bits, g, E, D, F = 4, 128, 8, 256, 256
    tokens, topk = 700, 8  # M = 5600 > _QMOE_MAX_TOKENS, 2 token chunks
    gu = fuse_gate_up(_stacked_random(rng, E, D, F, bits, g),
                      _stacked_random(rng, E, D, F, bits, g))
    down = _stacked_random(rng, E, F, D, bits, g)
    sq = {"gateup": gu, "down": down}
    spec = ModelSpec(model_type="qwen3_moe", vocab_size=128, hidden_size=D,
                     intermediate_size=F, num_layers=1, num_heads=4,
                     num_kv_heads=2, head_dim=64, num_experts=E,
                     num_experts_per_tok=topk, moe_intermediate_size=F)
    x = jnp.asarray(rng.standard_normal((tokens, D)) * 0.5, jnp.bfloat16)
    # DISTINCT experts per token (real top-k never repeats; the dense
    # fallback's scatter would collapse duplicates while ragged paths sum)
    top_i = jnp.asarray(
        np.stack([rng.permutation(E)[:topk] for _ in range(tokens)]),
        jnp.int32)
    top_w = jnp.asarray(
        rng.uniform(0.1, 1.0, (tokens, topk)).astype(np.float32))

    registry.set_backend("pallas_interpret")
    try:
        y_e2e = np.asarray(
            tr._moe_ragged_apply_q(spec, sq, x, top_w, top_i), np.float32)
        os.environ["GPTQ_TPU_QMOE_E2E"] = "0"
        y_dense = np.asarray(
            tr._moe_ragged_apply_q(spec, sq, x, top_w, top_i), np.float32)
    finally:
        os.environ.pop("GPTQ_TPU_QMOE_E2E", None)
        registry.set_backend("auto")
    rel = (np.linalg.norm(y_e2e - y_dense)
           / (np.linalg.norm(y_dense) + 1e-9))
    assert rel < 2e-2, rel
    # e2e really took the kernel path: bm raised, not the dense loop
    assert tokens * topk > tr._QMOE_MAX_TOKENS


def test_e2e_gelu_exact_matches_reference_act():
    """The kernels' "gelu" must be the EXACT erf form like transformer._act
    (jax.nn.gelu defaults to tanh-approx — review finding)."""
    import jax

    from gptqmodel_tpu.ops.pallas_qmoe import _act_kernel

    v = jnp.asarray(np.linspace(-4, 4, 257, dtype=np.float32))
    got = np.asarray(_act_kernel("gelu")(v))
    ref = np.asarray(jax.nn.gelu(v, approximate=False))
    np.testing.assert_array_equal(got, ref)
    approx = np.asarray(jax.nn.gelu(v, approximate=True))
    assert not np.array_equal(got, approx)  # the bug this guards against


def test_e2e_multichunk_ragged_tail_matches_dense_fallback(monkeypatch):
    """>=3 token chunks with a NON-multiple tail (VERDICT r4 #4): shrink the
    chunk via GPTQ_TPU_QMOE_CHUNK so 700 tokens become 3x192 + 124, and the
    chunked e2e kernel must still match the dense all-expert fallback
    (chunk-boundary slicing is exact — routing is per-token). The on-chip
    analog at real shapes is scripts/verify_moe_prefill_parity_tpu.py."""
    import os

    import jax.numpy as jnp

    from gptqmodel_tpu.models.spec import ModelSpec
    from gptqmodel_tpu.models import transformer as tr
    from gptqmodel_tpu.ops import registry
    from gptqmodel_tpu.ops.pallas_qmoe import fuse_gate_up

    rng = np.random.default_rng(16)
    bits, g, E, D, F = 4, 128, 8, 256, 256
    tokens, topk = 700, 8
    gu = fuse_gate_up(_stacked_random(rng, E, D, F, bits, g),
                      _stacked_random(rng, E, D, F, bits, g))
    down = _stacked_random(rng, E, F, D, bits, g)
    sq = {"gateup": gu, "down": down}
    spec = ModelSpec(model_type="qwen3_moe", vocab_size=128, hidden_size=D,
                     intermediate_size=F, num_layers=1, num_heads=4,
                     num_kv_heads=2, head_dim=64, num_experts=E,
                     num_experts_per_tok=topk, moe_intermediate_size=F)
    x = jnp.asarray(rng.standard_normal((tokens, D)) * 0.5, jnp.bfloat16)
    top_i = jnp.asarray(
        np.stack([rng.permutation(E)[:topk] for _ in range(tokens)]),
        jnp.int32)
    top_w = jnp.asarray(
        rng.uniform(0.1, 1.0, (tokens, topk)).astype(np.float32))

    monkeypatch.setenv("GPTQ_TPU_QMOE_CHUNK", "192")
    registry.set_backend("pallas_interpret")
    try:
        y_e2e = np.asarray(
            tr._moe_ragged_apply_q(spec, sq, x, top_w, top_i), np.float32)
        monkeypatch.setenv("GPTQ_TPU_QMOE_E2E", "0")
        y_dense = np.asarray(
            tr._moe_ragged_apply_q(spec, sq, x, top_w, top_i), np.float32)
    finally:
        registry.set_backend("auto")
    rel = (np.linalg.norm(y_e2e - y_dense)
           / (np.linalg.norm(y_dense) + 1e-9))
    assert rel < 2e-2, rel


@pytest.mark.parametrize("unroll", [2, 3, 4])
def test_e2e_unroll_matches_unroll1(unroll):
    """The unrolled slot loop (round 4, VERDICT #2) must reproduce the
    U=1 kernel: same slots, same experts, U chains interleaved + batched
    gather/combine dots. n_used NOT a multiple of U exercises the pad."""
    import jax.numpy as jnp

    from gptqmodel_tpu.ops.pallas_qmoe import (
        fuse_gate_up, plan_rows_jit, qmoe_mlp_forward_e2e)

    rng = np.random.default_rng(21)
    bits, g, E, D, F = 4, 128, 16, 256, 256
    tokens, topk, bm = 8, 4, 8
    gu = fuse_gate_up(_stacked_random(rng, E, D, F, bits, g),
                      _stacked_random(rng, E, D, F, bits, g))
    down = _stacked_random(rng, E, F, D, bits, g)
    x = jnp.asarray(rng.standard_normal((tokens, D)) * 0.5, jnp.bfloat16)
    top_i = np.stack([rng.permutation(E)[:topk] for _ in range(tokens)])
    flat_e = jnp.asarray(top_i.reshape(-1), jnp.int32)
    M = tokens * topk
    S = -(-M // bm) + min(E, M)
    ids, counts, row_pos = plan_rows_jit(flat_e, E, bm, S)
    tok_flat = jnp.arange(M, dtype=jnp.int32) // topk
    w_flat = jnp.asarray(
        rng.uniform(0.1, 1.0, (M,)).astype(np.float32))

    outs = {}
    for u in (1, unroll):
        outs[u] = np.asarray(qmoe_mlp_forward_e2e(
            x, row_pos, tok_flat, w_flat, ids, counts, gu, down,
            act="silu", bm=bm, interpret=True, unroll=u), np.float32)
    np.testing.assert_allclose(outs[unroll], outs[1], rtol=2e-5, atol=1e-5)


def _tiny_ql(rng, out_f, in_f, bits=4, g=128):
    from gptqmodel_tpu.ops.qlinear import make_quant_linear
    from gptqmodel_tpu.ops.registry import post_init_module

    G = in_f // g
    Q = rng.integers(0, 2 ** bits, size=(out_f, in_f), dtype=np.int64)
    scales = (rng.random((G, out_f)) * 0.02 + 0.005).astype(np.float32)
    zeros = np.full((G, out_f), 2 ** (bits - 1), np.int64)
    return post_init_module(make_quant_linear(
        Q=Q, scales=scales, zeros=zeros, g_idx=None, bias=None,
        bits=bits, group_size=g, sym=True, v1=False))


def test_stacked_rt_e2e_matches_interchange(monkeypatch):
    """Round-4 rt stacked experts (whole-K-tile rt gate|up, session Z12):
    the e2e kernel with rt gu must match (a) the interchange e2e kernel and
    (b) the dense fallback, through the REAL stack_packed_experts path.
    D=512 makes rt eligible (2K/pf % g == 0); down (K=256) stays
    interchange automatically."""
    import jax.numpy as jnp

    from gptqmodel_tpu.models.spec import ModelSpec
    from gptqmodel_tpu.models import transformer as tr
    from gptqmodel_tpu.ops import registry
    from gptqmodel_tpu.ops.pallas_qmoe import (
        fuse_gate_up, stack_packed_experts)

    rng = np.random.default_rng(31)
    E, D, F, g, topk, tokens = 4, 512, 256, 128, 2, 6
    gates = [_tiny_ql(rng, F, D) for _ in range(E)]
    ups = [_tiny_ql(rng, F, D) for _ in range(E)]
    downs = [_tiny_ql(rng, D, F) for _ in range(E)]

    def build(rt_env):
        monkeypatch.setenv("GPTQ_TPU_QMOE_RT", rt_env)
        # pin the whole-group-only mode: this test exercises the MIXED
        # kernel (rt gu + interchange down + perm dot); the subgroup-rt
        # down is covered by test_stacked_rt_subgroup_down
        monkeypatch.setenv("GPTQ_TPU_QMOE_RT_SUBGROUP", "0")
        sq = {"gateup": fuse_gate_up(stack_packed_experts(gates),
                                     stack_packed_experts(ups)),
              "down": stack_packed_experts(downs)}
        return sq

    sq_rt = build("1")
    sq_ic = build("0")
    assert sq_rt["gateup"].rt and not sq_ic["gateup"].rt
    assert not sq_rt["down"].rt  # whole-group mode: K=256 parts misalign

    spec = ModelSpec(model_type="qwen3_moe", vocab_size=128, hidden_size=D,
                     intermediate_size=F, num_layers=1, num_heads=4,
                     num_kv_heads=2, head_dim=64, num_experts=E,
                     num_experts_per_tok=topk, moe_intermediate_size=F)
    x = jnp.asarray(rng.standard_normal((tokens, D)) * 0.5, jnp.bfloat16)
    top_i = jnp.asarray(
        np.stack([rng.permutation(E)[:topk] for _ in range(tokens)]),
        jnp.int32)
    top_w = jnp.asarray(
        rng.uniform(0.1, 1.0, (tokens, topk)).astype(np.float32))

    registry.set_backend("pallas_interpret")
    try:
        y_rt = np.asarray(
            tr._moe_ragged_apply_q(spec, sq_rt, x, top_w, top_i), np.float32)
        y_ic = np.asarray(
            tr._moe_ragged_apply_q(spec, sq_ic, x, top_w, top_i), np.float32)
        monkeypatch.setenv("GPTQ_TPU_QMOE_E2E", "0")
        monkeypatch.setattr(tr, "_QMOE_MAX_TOKENS", 0)
        y_dense = np.asarray(
            tr._moe_ragged_apply_q(spec, sq_ic, x, top_w, top_i), np.float32)
        # rt stacked on a non-e2e path must fall back to dense (correctness)
        y_rt_fb = np.asarray(
            tr._moe_ragged_apply_q(spec, sq_rt, x, top_w, top_i), np.float32)
    finally:
        registry.set_backend("auto")
    for name, y in (("ic", y_ic), ("dense", y_dense), ("rt_fb", y_rt_fb)):
        rel = np.linalg.norm(y_rt - y) / (np.linalg.norm(y) + 1e-9)
        assert rel < 2e-2, (name, rel)

    # the dense-fallback dequant reverses the rt rows exactly
    w_rt = np.asarray(tr._moe_dequant_stacked(sq_rt["gateup"], 1), np.float32)
    w_ic = np.asarray(tr._moe_dequant_stacked(sq_ic["gateup"], 1), np.float32)
    np.testing.assert_array_equal(w_rt, w_ic)


def test_stacked_rt_subgroup_down(monkeypatch):
    """Sub-group rt segments (GPTQ_TPU_QMOE_RT_SUBGROUP=1): down's magic
    parts don't cover whole groups (K=256, g=128 -> 64-row parts), so the
    contract cuts segments at gcd(rpp, g) lanes — outputs must match the
    interchange path and the dense fallback."""
    import jax.numpy as jnp

    from gptqmodel_tpu.models.spec import ModelSpec
    from gptqmodel_tpu.models import transformer as tr
    from gptqmodel_tpu.ops import registry
    from gptqmodel_tpu.ops.pallas_qmoe import (
        fuse_gate_up, stack_packed_experts)

    rng = np.random.default_rng(47)
    E, D, F, g, topk, tokens = 4, 512, 256, 128, 2, 6
    gates = [_tiny_ql(rng, F, D) for _ in range(E)]
    ups = [_tiny_ql(rng, F, D) for _ in range(E)]
    downs = [_tiny_ql(rng, D, F) for _ in range(E)]

    monkeypatch.setenv("GPTQ_TPU_QMOE_RT_SUBGROUP", "1")
    sq_rt = {"gateup": fuse_gate_up(stack_packed_experts(gates),
                                    stack_packed_experts(ups)),
             "down": stack_packed_experts(downs)}
    assert sq_rt["gateup"].rt and sq_rt["down"].rt
    monkeypatch.setenv("GPTQ_TPU_QMOE_RT", "0")
    sq_ic = {"gateup": fuse_gate_up(stack_packed_experts(gates),
                                    stack_packed_experts(ups)),
             "down": stack_packed_experts(downs)}
    monkeypatch.delenv("GPTQ_TPU_QMOE_RT")

    spec = ModelSpec(model_type="qwen3_moe", vocab_size=128, hidden_size=D,
                     intermediate_size=F, num_layers=1, num_heads=4,
                     num_kv_heads=2, head_dim=64, num_experts=E,
                     num_experts_per_tok=topk, moe_intermediate_size=F)
    x = jnp.asarray(rng.standard_normal((tokens, D)) * 0.5, jnp.bfloat16)
    top_i = jnp.asarray(
        np.stack([rng.permutation(E)[:topk] for _ in range(tokens)]),
        jnp.int32)
    top_w = jnp.asarray(
        rng.uniform(0.1, 1.0, (tokens, topk)).astype(np.float32))

    registry.set_backend("pallas_interpret")
    try:
        y_rt = np.asarray(
            tr._moe_ragged_apply_q(spec, sq_rt, x, top_w, top_i), np.float32)
        y_ic = np.asarray(
            tr._moe_ragged_apply_q(spec, sq_ic, x, top_w, top_i), np.float32)
        monkeypatch.setenv("GPTQ_TPU_QMOE_E2E", "0")
        monkeypatch.setattr(tr, "_QMOE_MAX_TOKENS", 0)
        y_dense = np.asarray(
            tr._moe_ragged_apply_q(spec, sq_rt, x, top_w, top_i), np.float32)
    finally:
        registry.set_backend("auto")
    for name, y in (("ic", y_ic), ("dense", y_dense)):
        rel = np.linalg.norm(y_rt - y) / (np.linalg.norm(y) + 1e-9)
        assert rel < 2e-2, (name, rel)
