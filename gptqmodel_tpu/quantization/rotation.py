"""QuaRot-style orthogonal rotation (reference quantization/rotation/
rotation.py:50 ``fuse_layer_norms``, :98-170 rotate embeddings/attn/mlp/head).

The hidden stream is rotated by an orthogonal R (Hadamard or random): RMSNorm
is rotation-invariant once its elementwise weight is fused into the adjacent
linears, so the rotated model is FUNCTIONALLY IDENTICAL while weight outliers
get spread across channels — incoherence that helps low-bit quantization.

Rules (row-vector convention, y = x @ Wᵀ):
- fuse: input norms fold into the input dims (columns) of consuming linears;
  the final norm folds into lm_head; all norm weights become 1.
- rotate: input-side modules (embed rows, q/k/v, gate/up/w1/w3, MoE router,
  lm_head) get W @ R; output-side modules (o_proj, down/w2) get Rᵀ @ W and
  bias @ R. Per-head spaces (RoPE, qk-norm) are untouched.

Applied per layer during the streaming quantization loop; the saved
checkpoint carries rotated weights + unit norms and loads like any other.
"""

from __future__ import annotations

import logging

import numpy as np

from gptqmodel_tpu.models.spec import ModelSpec
log = logging.getLogger("gptqmodel_tpu")


def hadamard_matrix(n: int) -> np.ndarray:
    """Normalized Sylvester-Hadamard for power-of-two n."""
    assert n & (n - 1) == 0, f"hadamard needs power-of-two size, got {n}"
    H = np.ones((1, 1), np.float64)
    while H.shape[0] < n:
        H = np.block([[H, H], [H, -H]])
    return (H / np.sqrt(n)).astype(np.float64)


def random_orthogonal(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    q, r = np.linalg.qr(rng.standard_normal((n, n)))
    return (q * np.sign(np.diag(r))[None, :]).astype(np.float64)


def rotation_matrix(n: int, mode: str = "hadamard", seed: int = 0) -> np.ndarray:
    if mode == "hadamard":
        if n & (n - 1) == 0:
            return hadamard_matrix(n)
        log.warning("hidden=%d not a power of two; using random orthogonal", n)
        return random_orthogonal(n, seed)
    if mode == "random":
        return random_orthogonal(n, seed)
    raise ValueError(f"unknown rotation mode: {mode}")


def check_rotatable(spec: ModelSpec):
    if spec.family != "llama":
        raise NotImplementedError(f"rotation unsupported for family {spec.family}")
    if spec.rms_norm_offset or spec.post_norms or spec.embedding_multiplier != 1.0:
        raise NotImplementedError(
            "rotation unsupported for gemma-style norm offsets/multipliers"
        )


def _fold_norm_into(norm: dict, linears: list[dict]):
    """W <- W · diag(norm_w) on input columns; norm weight -> 1."""
    w_norm = np.asarray(norm["weight"], np.float64)
    for lin in linears:
        W = np.asarray(lin["weight"], np.float64)
        lin["weight"] = (W * w_norm[None, :]).astype(np.float32)
    norm["weight"] = np.ones_like(np.asarray(norm["weight"], np.float32))


def _rot_in(lin: dict, R: np.ndarray):
    W = np.asarray(lin["weight"], np.float64)
    lin["weight"] = (W @ R).astype(np.float32)


def _rot_out(lin: dict, R: np.ndarray):
    W = np.asarray(lin["weight"], np.float64)
    lin["weight"] = (R.T @ W).astype(np.float32)
    if lin.get("bias") is not None:
        b = np.asarray(lin["bias"], np.float64)
        lin["bias"] = (b @ R).astype(np.float32)


def rotate_base(spec: ModelSpec, base: dict, R: np.ndarray):
    """Embeddings, final norm fusion, lm_head."""
    emb = base["model"]["embed_tokens"]
    emb["weight"] = (np.asarray(emb["weight"], np.float64) @ R).astype(np.float32)
    head = base.get("lm_head")
    if head is not None:
        _fold_norm_into(base["model"]["norm"], [head])
        _rot_in(head, R)
    elif spec.tie_word_embeddings:
        # tied head reads the rotated embedding; fold the final norm weight
        # into... not separable from the embedding (also the input table).
        raise NotImplementedError(
            "rotation with tied word embeddings is not supported"
        )


def rotate_layer(spec: ModelSpec, lp: dict, R: np.ndarray):
    """Fuse this layer's norms and rotate its hidden-side weights."""
    attn = lp["self_attn"]
    qkv = (
        [attn["qkv_proj"]]
        if "qkv_proj" in attn
        else [attn["q_proj"], attn["k_proj"], attn["v_proj"]]
    )
    _fold_norm_into(lp["input_layernorm"], qkv)
    for lin in qkv:
        _rot_in(lin, R)
    _rot_out(attn["o_proj"], R)

    if "block_sparse_moe" in lp:
        moe = lp["block_sparse_moe"]
        ins = [moe["gate"]] + [e["w1"] for e in moe["experts"]] + [
            e["w3"] for e in moe["experts"]
        ]
        _fold_norm_into(lp["post_attention_layernorm"], ins)
        for lin in ins:
            _rot_in(lin, R)
        for e in moe["experts"]:
            _rot_out(e["w2"], R)
    elif "experts" in lp.get("mlp", {}):
        moe = lp["mlp"]
        router = [moe["gate"]] if "gate" in moe else []
        ins = router + [e["gate_proj"] for e in moe["experts"]] + [
            e["up_proj"] for e in moe["experts"]
        ]
        _fold_norm_into(lp["post_attention_layernorm"], ins)
        for lin in ins:
            _rot_in(lin, R)
        for e in moe["experts"]:
            _rot_out(e["down_proj"], R)
    else:
        mlp = lp["mlp"]
        ins = (
            [mlp["gate_up_proj"]]
            if "gate_up_proj" in mlp
            else [mlp["gate_proj"], mlp["up_proj"]]
        )
        _fold_norm_into(lp["post_attention_layernorm"], ins)
        for lin in ins:
            _rot_in(lin, R)
        _rot_out(mlp["down_proj"], R)
