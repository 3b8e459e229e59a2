"""GAR — group-aware reordering (reference gptqmodel/quantization/gar.py:38-130).

Activation-order benefits of desc_act without the inference-time ``g_idx``
gather: columns are sorted by Hessian-diagonal *within* each group, and whole
groups are reordered by their max metric. Groups stay contiguous, so packed
scales/zeros index linearly at inference — the TPU fast path depends on this
(see ops/pallas/w4a16.py).
"""

from __future__ import annotations

import numpy as np


def compute_local_perms(metric: np.ndarray, group_size: int) -> np.ndarray:
    """Per-group descending sort. Returns [n_groups, group_size] of
    within-group indices."""
    g = metric.reshape(-1, group_size)
    return np.argsort(-g, axis=1)


def compute_global_perm(metric: np.ndarray, group_size: int) -> np.ndarray:
    """Order groups by their max metric, descending. Returns [n_groups]."""
    gmax = metric.reshape(-1, group_size).max(axis=1)
    return np.argsort(-gmax, kind="stable")


def compose_final_perm(
    local_perms: np.ndarray, global_perm: np.ndarray, group_size: int
) -> np.ndarray:
    """Compose into one flat column permutation [in_features]."""
    base = global_perm[:, None] * group_size  # start col of each source group
    return (base + local_perms[global_perm]).reshape(-1)


def invert_perm(perm: np.ndarray) -> np.ndarray:
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=perm.dtype)
    return inv


def compute_gar_perm(metric: np.ndarray, group_size: int) -> np.ndarray:
    """Full GAR permutation from a per-column importance metric (diag(H))."""
    n = metric.shape[0]
    assert n % group_size == 0, (n, group_size)
    local = compute_local_perms(metric, group_size)
    glob = compute_global_perm(metric, group_size)
    return compose_final_perm(local, glob, group_size)
