"""EXL3 trellis quantization (QTIP-style), TPU-native.

Re-design of the reference EXL3 pipeline
(gptqmodel/exllamav3/modules/quant/exl3_lib/quantize.py:863 ``quantize_exl3``,
gptqmodel_ext/exllamav3/quant/quantize.cu ``quantize_tiles_kernel``,
codebook.cuh ``decode_3inst``) for JAX/TPU:

* the procedural codebooks (3INST / MCG / MUL1) are materialized once as a
  65536-entry fp16-exact table (integer hash + fp16 bit tricks reproduced in
  numpy) — gathers replace PTX bit-ops;
* the tail-biting Viterbi search over the bitshift trellis
  (states = 16-bit codewords, nodes = low ``16-K`` bits, stride-K sliding
  window) runs as a vectorized ``lax.scan`` min-plus DP over all tiles of a
  16-row block at once (fp32 costs — strictly better conditioned than the
  reference's fp16 cost accumulation; indices stay format-compatible because
  any valid trellis path decodes identically);
* LDLQ error feedback (quantize.py:335) keeps the reference blocking: 16-row
  blocks processed bottom-up with an accumulated ``L.T @ err`` compensation
  term, all matmuls jitted;
* regularization (quantize.py:771): random sign flips su/sv, optional output
  channel scales (auto by Hessian-diagonal skew), 128-block Hadamard sandwich,
  golden-section global-scale search on a wrapped-diagonal tile sample.

The packed artifact matches the exllamav3 checkpoint format bit-exactly:
``trellis`` int16 [k/16, n/16, 256*K/16] (tensor-core permuted indices,
span-packed, SWAP16 word order — pack.cu:10), ``suh``/``svh`` fp16 sign/scale
vectors, with codebook tag tensors (``mcg``/``mul1``) as in quantize.py:1055.
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from gptqmodel_tpu.ops.hadamard import fht_np

HAD_K = 128  # input-side Hadamard block (quantize.py:22)
HAD_N = 128  # output-side Hadamard block
CODEBOOK_SCALE = 1.24371088  # RMS of the codebook distribution (quantize.py:23)

_CB_IDS = {"3inst": 0, "mcg": 1, "mul1": 2}


# --------------------------------------------------------------------------
# procedural codebooks (codebook.cuh:26-105), fp16-exact in numpy
# --------------------------------------------------------------------------


@lru_cache(maxsize=None)
def codebook_table(cb: str) -> np.ndarray:
    """Decode all 65536 16-bit codewords -> float32 values (fp16-exact).

    cb='3inst': y = ((x*89226354 + 64248484) & 0x8fff8fff) ^ 0x3b603b60,
    summed as two fp16 halves (the lop3 LUT 0x6a is mask-select+xor).
    cb='mcg':   same with x*0xCBAC1FED, no additive constant.
    cb='mul1':  x*0x83DCD12D; fp16-bitcast(byte-sum + 0x6400) fma'd with
    1/147.7 and -10.39 (codebook.cuh:45-55).
    """
    x = np.arange(65536, dtype=np.uint64)
    if cb == "3inst":
        v = (x * 89226354 + 64248484) & 0xFFFFFFFF
    elif cb == "mcg":
        v = (x * 0xCBAC1FED) & 0xFFFFFFFF
    elif cb == "mul1":
        v = (x * 0x83DCD12D) & 0xFFFFFFFF
        byte_sum = (v & 0xFF) + ((v >> 8) & 0xFF) + ((v >> 16) & 0xFF) + (
            (v >> 24) & 0xFF
        )
        h = (byte_sum + 0x6400).astype(np.uint16).view(np.float16)
        k_inv = np.uint16(0x1EEE).view(np.float16)
        k_bias = np.uint16(0xC931).view(np.float16)
        # hfma = single rounding: exact in float64, then one round to fp16
        fused = h.astype(np.float64) * float(k_inv) + float(k_bias)
        return fused.astype(np.float16).astype(np.float32)
    else:
        raise ValueError(f"unknown EXL3 codebook: {cb}")
    v = ((v & 0x8FFF8FFF) ^ 0x3B603B60).astype(np.uint32)
    lo = (v & 0xFFFF).astype(np.uint16).view(np.float16)
    hi = (v >> 16).astype(np.uint16).view(np.float16)
    return (lo + hi).astype(np.float32)  # numpy f16 add is correctly rounded


@lru_cache(maxsize=None)
def tensor_core_perm() -> np.ndarray:
    """m16n16 mma fragment ordering (quantize.py:29-46).

    Kept so the stored trellis indices are laid out exactly like exllamav3
    checkpoints; on TPU it is just a fixed host-side permutation.
    """
    perm = np.zeros(256, dtype=np.int64)
    for t in range(32):
        r0 = (t % 4) * 2
        rows = (r0, r0 + 1, r0 + 8, r0 + 9)
        c0 = t // 4
        for ci, c in enumerate((c0, c0 + 8)):
            for ri, r in enumerate(rows):
                perm[t * 8 + ci * 4 + ri] = r * 16 + c
    return perm


@lru_cache(maxsize=None)
def tensor_core_perm_i() -> np.ndarray:
    return np.argsort(tensor_core_perm())


# --------------------------------------------------------------------------
# tail-biting Viterbi over the bitshift trellis (quantize.cu:15-231)
# --------------------------------------------------------------------------


def _edge_batch(K: int) -> int:
    """Tiles per DP batch, sized so the edge tape stays ~<=256MB."""
    E = 65536 >> K
    return max(8, min(1024, (256 * 1024 * 1024) // (256 * E * 2)))


@lru_cache(maxsize=None)
def _viterbi_fns(K: int, cb: str, B: int):
    """Build jitted (forward, backtrack) for a fixed (K, codebook, batch).

    Gather-free min-plus step: a 16-bit state splits into bit fields
    ``k (K) | eh (16-2K) | el (K)``; the node index is ``k|eh`` and the
    in-edge lookup ``costs[state >> K]`` is then just a reshape+broadcast —
    XLA sees pure elementwise + reduce ops (VPU-friendly, no scatter/gather).
    """
    E = 65536 >> K
    Q = 1 << K
    Kr = 16 - K
    EH = 1 << (Kr - K)
    eh_range = jnp.arange(EH, dtype=np.int32)
    table3 = jnp.asarray(codebook_table(cb).reshape(Q, EH, Q))

    def _step(costs, w_t):
        # costs (B,E) node-linear (bits k|eh); w_t (B,)
        err = (table3[None] - w_t[:, None, None, None]) ** 2  # (B,Q,EH,EL)
        tot = err + costs.reshape(B, Q, EH)[..., None]
        nxt = jnp.min(tot, axis=1)  # (B,EH,EL)
        k_star = jnp.argmin(tot, axis=1).astype(jnp.int32)
        edge = (k_star << (Kr - K)) | eh_range[None, :, None]
        return nxt.reshape(B, E), edge.reshape(B, E).astype(jnp.uint16)

    # unroll: the 256-step scans are dispatch-latency-bound on small tile
    # batches; unrolling amortizes the per-step overhead
    @jax.jit
    def forward_free(ws):  # ws (256, B) — pass 1, unconstrained start
        costs0 = jnp.zeros((B, E), jnp.float32)
        costs, edges = jax.lax.scan(_step, costs0, ws, unroll=16)
        return jnp.argmin(costs, axis=1).astype(jnp.int32), edges

    @jax.jit
    def forward_pinned(ws, start):  # pass 2: in-edge of step 0 == start
        costs0 = jnp.full((B, E), jnp.inf, jnp.float32)
        costs0 = costs0.at[jnp.arange(B), start].set(0.0)
        _, edges = jax.lax.scan(_step, costs0, ws, unroll=16)
        return edges

    @jax.jit
    def backtrack(edges, end):  # edges (T,B,E); walk T-1..0 from node `end`
        b_range = jnp.arange(B)

        def _bstep(edge, edges_t):
            prev = edges_t[b_range, edge].astype(jnp.int32)
            enc = (prev << K) | edge  # (quantize.cu:203)
            return prev, enc.astype(jnp.uint16)

        edge_final, enc = jax.lax.scan(_bstep, end, edges, reverse=True, unroll=16)
        return edge_final, enc  # enc (T, B) in step order

    return forward_free, forward_pinned, backtrack


def viterbi_quantize_tiles(
    tiles: np.ndarray, K: int, cb: str
) -> tuple[np.ndarray, np.ndarray]:
    """Quantize (T, 256) fp32 tiles (tensor-core order) -> (values, indices).

    Two-pass tail-biting exactly as quantize.cu:255-262: pass 1 starts at
    position 128 unconstrained, backtracks half-way to find the wrap node;
    pass 2 re-solves from position 0 with that node pinned at both ends.
    """
    tiles = np.ascontiguousarray(tiles, dtype=np.float32)
    T = tiles.shape[0]
    assert tiles.shape[1] == 256
    # power-of-two batch buckets: one compile per (K, cb, bucket)
    B = 8
    while B < min(_edge_batch(K), T):
        B *= 2
    fwd_free, fwd_pin, backtrack = _viterbi_fns(K, cb, B)
    table = codebook_table(cb)

    out_idx = np.empty((T, 256), dtype=np.uint16)
    for lo in range(0, T, B):
        hi = min(lo + B, T)
        chunk = tiles[lo:hi]
        if hi - lo < B:  # pad to the jitted batch
            chunk = np.concatenate(
                [chunk, np.zeros((B - (hi - lo), 256), np.float32)], axis=0
            )
        # pass 1: roll=128 — step i handles position (i+128)%256
        ws1 = jnp.asarray(np.roll(chunk, -128, axis=1).T)
        end1, edges1 = fwd_free(ws1)
        # kernel backtracks only until ri==0 (i down to 128): steps 128..255
        wrap, _ = backtrack(edges1[128:], end1)
        del edges1
        # pass 2: roll=0, pinned start & end (tail-biting)
        ws2 = jnp.asarray(chunk.T)
        edges2 = fwd_pin(ws2, wrap)
        _, enc = backtrack(edges2, wrap)
        del edges2
        out_idx[lo:hi] = np.asarray(enc).T[: hi - lo]
    return table[out_idx].astype(np.float32), out_idx


# --------------------------------------------------------------------------
# block LDL + LDLQ (quantize.py:276-451)
# --------------------------------------------------------------------------


def block_ldl(H: np.ndarray, b: int = 16) -> np.ndarray:
    """H = L D L^T with identity diagonal blocks; returns L (diag zeroed).

    Mirrors quantize.py:276 block_ldl: Cholesky, then right-normalize each
    block column by the inverse of its diagonal block.
    """
    n = H.shape[0]
    assert n % b == 0
    m = n // b
    L = np.linalg.cholesky(np.asarray(H, np.float64))
    DL = np.stack([L[i * b : (i + 1) * b, i * b : (i + 1) * b] for i in range(m)])
    DLi = np.linalg.inv(DL)
    L = L.reshape(n, m, b)
    L = np.einsum("kmb,mbc->kmc", L, DLi)
    L = L.reshape(n, n)
    for i in range(m):
        L[i * b : (i + 1) * b, i * b : (i + 1) * b] = np.eye(b)
    idx = np.arange(n)
    L[idx, idx] = 0.0  # quantize.py:611-612
    return np.ascontiguousarray(L, np.float32)


@partial(jax.jit, static_argnames=())
def _comp_update(prod, Lblk, err):
    return prod + Lblk.T @ err


def ldlq(
    W: np.ndarray, L: np.ndarray | None, K: int, cb: str
) -> tuple[np.ndarray, np.ndarray]:
    """LDLQ over 16-row blocks bottom-up (quantize.py:335; L=None -> the
    uncompensated fallback path, quantize.py:454).

    W: (k, n) regularized weights. Returns (W_q (k,n), encoded
    (k/16, n/16, 256) uint16 in tensor-core order).
    """
    k, n = W.shape
    assert k % 16 == 0 and n % 16 == 0
    tiles_k, tiles_n = k // 16, n // 16
    tc = tensor_core_perm()
    tci = tensor_core_perm_i()

    Wq = np.zeros((k, n), np.float32)
    encoded = np.zeros((tiles_k, tiles_n, 256), np.uint16)
    prod = jnp.zeros((k, n), jnp.float32) if L is not None else None
    Lj = jnp.asarray(L) if L is not None else None
    Wj = jnp.asarray(W, jnp.float32)

    for bi in range(k - 16, -1, -16):
        rows = np.asarray(W[bi : bi + 16], np.float32)
        if prod is not None:
            rows = rows + np.asarray(prod[bi : bi + 16])
        tiles = rows.reshape(16, tiles_n, 16).transpose(1, 0, 2).reshape(tiles_n, 256)
        tiles = tiles[:, tc]
        q_w, q_i = viterbi_quantize_tiles(tiles, K, cb)
        q_w = q_w[:, tci]
        Wq[bi : bi + 16] = (
            q_w.reshape(tiles_n, 16, 16).transpose(1, 0, 2).reshape(16, n)
        )
        encoded[bi // 16] = q_i
        if prod is not None:
            err = Wj[bi : bi + 16] - jnp.asarray(Wq[bi : bi + 16])
            prod = _comp_update(prod, Lj[bi : bi + 16], err)
    return Wq, encoded


# --------------------------------------------------------------------------
# pack / unpack (pack.cu:10-57): 16 spans of 16 weights, K bits each,
# MSB-first, adjacent uint16 pairs swapped (SWAP16 on the uint32 store)
# --------------------------------------------------------------------------


def pack_trellis(encoded: np.ndarray, K: int) -> np.ndarray:
    """(T, 256) uint16 indices -> (T, 256*K/16) int16 packed words."""
    enc = np.asarray(encoded, np.uint32) & ((1 << K) - 1)
    T = enc.shape[0]
    words = np.zeros((T, 16 * K), np.uint16)
    for t in range(16):  # span
        j = K * t
        kk = 32
        buf = np.zeros(T, np.uint32)
        for nn in range(16):
            kk -= K
            buf |= enc[:, 16 * t + nn] << kk
            if kk <= 16:
                words[:, j] = (buf >> 16).astype(np.uint16)
                buf = (buf << 16) & 0xFFFFFFFF
                kk += 16
                j += 1
    words = words.reshape(T, 8 * K, 2)[:, :, ::-1].reshape(T, 16 * K)  # SWAP16
    return words.view(np.int16)


def unpack_trellis(packed: np.ndarray, K: int) -> np.ndarray:
    """Inverse of pack_trellis: reconstruct full 16-bit windows.

    The K-bit chunks form a circular bitstream (tail-biting); codeword t is
    the 16-bit window ending at bit (t+1)*K of the ring, so one warm-up lap
    plus one recording lap of a K-bit shift register recovers all indices.
    """
    w = np.asarray(packed).view(np.uint16).astype(np.uint32)
    T = w.shape[0]
    assert w.shape[1] == 16 * K
    w = w.reshape(T, 8 * K, 2)[:, :, ::-1].reshape(T, 16 * K)  # undo SWAP16
    # chunk t = bits [t*K, (t+1)*K) of the span-concatenated stream
    chunks = np.zeros((T, 256), np.uint32)
    for t in range(256):
        pos = t * K
        wi, off = pos >> 4, pos & 15
        nxt = w[:, wi + 1] if wi + 1 < 16 * K else np.zeros(T, np.uint32)
        combined = (w[:, wi] << 16) | nxt
        chunks[:, t] = (combined >> (32 - off - K)) & ((1 << K) - 1)
    enc = np.zeros((T, 256), np.uint16)
    win = np.zeros(T, np.uint32)
    for lap in range(2):
        for t in range(256):
            win = ((win << K) | chunks[:, t]) & 0xFFFF
            if lap == 1:
                enc[:, t] = win.astype(np.uint16)
    return enc


# --------------------------------------------------------------------------
# regularization (quantize.py:648-860)
# --------------------------------------------------------------------------


def _had_l(x: np.ndarray, b: int) -> np.ndarray:
    """Left-multiply 128-row blocks by H_b/sqrt(b) (blockwise_preapply_had_l_)."""
    return fht_np(np.ascontiguousarray(x.T), b).T


def _had_r(x: np.ndarray, b: int) -> np.ndarray:
    return fht_np(x, b)


def g_scale_gss(
    W: np.ndarray, K: int, cb: str, width: int = 3
) -> tuple[float, float]:
    """Golden-section search for the global scale on a wrapped-diagonal tile
    sample (quantize.py:648)."""
    tiles_k, tiles_n = W.shape[0] // 16, W.shape[1] // 16
    tc = tensor_core_perm()
    sample = []
    for i in range(max(tiles_k, tiles_n)):
        for w in range(width):
            kk = (i % tiles_k) * 16
            nn = ((i + w) % tiles_n) * 16
            sample.append(W[kk : kk + 16, nn : nn + 16].reshape(256)[tc])
    tiles = np.stack(sample).astype(np.float32)

    def test_scale(s: float) -> float:
        qw, _ = viterbi_quantize_tiles(tiles * s, K, cb)
        return float(((qw / s - tiles) ** 2).mean())

    phi = (1 + math.sqrt(5)) / 2
    resphi = 2 - phi
    a, b = 0.1, 1.9
    x1 = a + resphi * (b - a)
    x2 = b - resphi * (b - a)
    f1, f2 = test_scale(x1), test_scale(x2)
    while abs(b - a) > 0.01:
        if f1 < f2:
            b, x2, f2 = x2, x1, f1
            x1 = a + resphi * (b - a)
            f1 = test_scale(x1)
        else:
            a, x1, f1 = x1, x2, f2
            x2 = b - resphi * (b - a)
            f2 = test_scale(x2)
    return (a + b) / 2, (f1 + f2) / 2


@dataclasses.dataclass
class Exl3Result:
    trellis: np.ndarray  # int16 [k/16, n/16, 256*K/16]
    suh: np.ndarray  # f16 [k]
    svh: np.ndarray  # f16 [n]
    Wq: np.ndarray  # f32 [k, n] reconstructed (original space) for replay
    proxy_err: float
    K: int
    cb: str
    apply_out_scales: bool
    g_scale: float


def prepare_exl3_hessian(
    H: np.ndarray, seed: int = 0, sigma_reg: float = 0.025
) -> dict:
    """Finalize a captured Hessian for EXL3 (quantize.py:561): regularize the
    diagonal, apply random input sign flips + 128-block Hadamard on both
    sides, block-LDL factor. Shared across modules with the same input."""
    H = np.asarray(H, np.float64).copy()
    k = H.shape[0]
    diag_mean = float(np.diag(H).mean())
    q_fallback = diag_mean < 1e-20
    idx = np.arange(k)
    H[idx, idx] += sigma_reg * diag_mean
    diag = H[idx, idx].copy()
    rng = np.random.default_rng(seed)
    su = np.sign(np.sign(rng.standard_normal(k)) + 1e-5).astype(np.float64)[:, None]
    H *= su.T
    H = _had_r(H, HAD_K)
    H *= su
    H = _had_l(H, HAD_K)
    L = None
    if not q_fallback:
        try:
            L = block_ldl(H, 16)
        except np.linalg.LinAlgError:
            # escalating diagonal floor, reference damp-ladder spirit
            for bump in (1e-4, 1e-2, 1.0):
                try:
                    Hb = H + np.eye(k) * (bump * max(diag_mean, 1e-12))
                    L = block_ldl(Hb, 16)
                    break
                except np.linalg.LinAlgError:
                    continue
            q_fallback = L is None
    return {
        "L": L,
        "su": su.astype(np.float32),
        "diag": diag.astype(np.float32),
        "q_fallback": q_fallback,
        "H": H,  # transformed-space H (for the proxy error)
    }


def quantize_exl3(
    W: np.ndarray,
    H_data: dict,
    K: int,
    cb: str = "mcg",
    out_scales: str | None = "auto",
    seed: int = 0,
    skip_g_scale: bool = False,
) -> Exl3Result:
    """Quantize one linear weight W (in_features k, out_features n).

    End-to-end analog of reference quantize_exl3 (quantize.py:863): takes the
    prepared Hessian dict from :func:`prepare_exl3_hessian` (reusable across
    q/k/v-style shared-input groups), returns the packed exllamav3-format
    tensors plus the reconstructed weight for true-sequential replay.
    """
    W = np.asarray(W, np.float32)
    k, n = W.shape
    assert k % HAD_K == 0, f"in_features {k} must be a multiple of {HAD_K}"
    assert n % HAD_N == 0, f"out_features {n} must be a multiple of {HAD_N}"
    assert 1 <= K <= 8
    q_fallback = H_data["q_fallback"]
    su = H_data["su"].astype(np.float64).reshape(k, 1)
    rng = np.random.default_rng(seed + 1)
    sv = np.sign(np.sign(rng.standard_normal(n)) + 1e-5).astype(np.float64)[None, :]

    Wr = W.astype(np.float64)

    # ---- output scales (quantize.py:771 regularize) ----
    force = {"always": True, "never": False, "auto": None, None: None}[out_scales]
    H_diag = H_data["diag"]
    if not q_fallback and H_diag is not None:
        d = np.sort(np.sqrt(np.maximum(H_diag, 0.0)))[::-1]
        cutoff = max(d.shape[0] // 50, 1)
        skew = float(d[:cutoff].sum() / max(d.sum(), 1e-30))
        apply_out_scales = (skew < 0.15) if force is None else force
    else:
        apply_out_scales = True if force is None else force
    ocs = np.sqrt((Wr**2).mean(axis=0, keepdims=True))
    mean = float(ocs.mean())
    if mean > 1e-30:
        ocs = ocs / mean
    zero_ocs = np.abs(ocs) < 1e-30
    if apply_out_scales:
        ocs[zero_ocs] = 0.1
        sv = sv * ocs + 1e-10
    Wr = Wr / sv
    sv[0, zero_ocs[0]] = 0.0

    Wr = _had_r(Wr, HAD_N)
    ics = np.sqrt((Wr**2).mean(axis=1, keepdims=True))
    ics[np.abs(ics) < 1e-30] = 0.1
    su = su * ics / (-CODEBOOK_SCALE) + 1e-10
    Wr = Wr / su
    Wr = _had_l(Wr, HAD_K)

    if skip_g_scale:
        g_scale = 1.0
    else:
        g_scale, _ = g_scale_gss(Wr.astype(np.float32), K, cb)
    Wr = (Wr * g_scale).astype(np.float32)
    su = su / g_scale

    # ---- trellis quantization with LDLQ feedback ----
    L = None if q_fallback else H_data["L"]
    Wq_r, encoded = ldlq(Wr, L, K, cb)

    # proxy error tr(E H E^T)/tr(W H W^T) in the transformed space
    if not q_fallback:
        Ht = np.asarray(H_data["H"], np.float32)
        E = Wr - Wq_r
        num = float(np.sum(E * (Ht @ E)))  # tr(E^T H E), quantize.py:994
        den = float(np.sum(Wr * (Ht @ Wr)))
        proxy_err = num / max(den, 1e-8)
    else:
        proxy_err = 0.0

    # ---- reconstruct in original space (quantize.py:1026-1031) ----
    Wq = _had_l(Wq_r.astype(np.float64), HAD_K) * su
    Wq = _had_r(Wq, HAD_N) * sv
    Wq = Wq.astype(np.float32)

    trellis = pack_trellis(encoded.reshape(-1, 256), K).reshape(
        k // 16, n // 16, 16 * K
    )
    return Exl3Result(
        trellis=trellis,
        suh=su.reshape(-1).astype(np.float16),
        svh=sv.reshape(-1).astype(np.float16),
        Wq=Wq,
        proxy_err=proxy_err,
        K=K,
        cb=cb,
        apply_out_scales=bool(apply_out_scales),
        g_scale=float(g_scale),
    )


def dequantize_exl3(
    trellis: np.ndarray, suh: np.ndarray, svh: np.ndarray, K: int, cb: str
) -> np.ndarray:
    """Full host-side reconstruction (load-time convert path; the inverse of
    quantize_exl3's packing + regularization)."""
    tiles_k, tiles_n, pw = trellis.shape
    assert pw == 16 * K
    enc = unpack_trellis(trellis.reshape(-1, pw), K)
    vals = codebook_table(cb)[enc][:, tensor_core_perm_i()]
    W = (
        vals.reshape(tiles_k, tiles_n, 16, 16)
        .transpose(0, 2, 1, 3)
        .reshape(tiles_k * 16, tiles_n * 16)
        .astype(np.float64)
    )
    W = _had_l(W, HAD_K) * np.asarray(suh, np.float64)[:, None]
    W = _had_r(W, HAD_N) * np.asarray(svh, np.float64)[None, :]
    return W.astype(np.float32)
