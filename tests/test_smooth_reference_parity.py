"""All 8 SmoothMethods vs the reference implementation's own numerics.

Imports /root/reference/gptqmodel/quantization/fallback_smooth.py (pure CPU
torch) as the oracle — smooth_block for the 7 clip/scale methods and
mse_optimal_quant for the MSE shrink search — and asserts the repo's numpy
implementations agree elementwise.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gptqmodel_tpu.quantization.smooth import mse_shrink_quant, smooth_weight

REF = "/root/reference/gptqmodel/quantization"


@pytest.fixture(scope="module")
def ref():
    """Load reference fallback_smooth without importing the gptqmodel package
    (its __init__ drags in CUDA deps): register a fake parent package whose
    ``.config`` submodule is a minimal stub providing the SmoothMethod
    descriptor classes, then import fallback_smooth under that package."""
    import importlib.util

    class _M:
        def __init__(self, name, **kw):
            self.name = name
            self.group_size_threshold = kw.pop("group_size_threshold", 0)
            for k, v in kw.items():
                setattr(self, k, v)

    stub = types.ModuleType("_refq.config")
    for cls, nm in [
        ("SmoothPercentile", "percentile"),
        ("SmoothPercentileAsymmetric", "percentile_asym"),
        ("SmoothMAD", "mad"),
        ("SmoothOutlier", "outlier"),
        ("SmoothSoftNorm", "softnorm"),
        ("SmoothLog", "log"),
        ("SmoothRowCol", "rowcol"),
        ("SmoothMSE", "mse"),
    ]:
        def make(nm):
            class C(_M):
                def __init__(self, **kw):
                    super().__init__(nm, **kw)

            C.__name__ = nm
            return C

        setattr(stub, cls, make(nm))
    stub.Fallback = object
    stub.QuantizeConfig = object

    pkg = types.ModuleType("_refq")
    pkg.__path__ = [REF]
    sys.modules["_refq"] = pkg
    sys.modules["_refq.config"] = stub

    spec = importlib.util.spec_from_file_location(
        "_refq.fallback_smooth", f"{REF}/fallback_smooth.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_refq.fallback_smooth"] = mod
    spec.loader.exec_module(mod)
    return {"smooth_block": mod.smooth_block,
            "mse_optimal_quant": mod.mse_optimal_quant, "_stub": stub}


class _FB:
    def __init__(self, smooth):
        self.smooth = smooth


def _W(seed=0, rows=16, cols=256, outliers=True):
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((rows, cols)).astype(np.float32) * 0.05
    if outliers:
        idx = rng.integers(0, cols, size=rows)
        W[np.arange(rows), idx] += rng.choice([-3.0, 3.0], size=rows)
    return W


CASES = [
    ("percentile", {"percentile": 97.0}),
    ("percentile_asym", {"low": 1.0, "high": 99.0}),
    ("mad", {"k": 2.75}),
    ("outlier", {"pct": 2.0}),
    ("softnorm", {"k": 2.5}),
    ("log", {"percentile": 98.0, "mu": 8.0}),
    ("rowcol", {"axis": "row"}),
    ("rowcol", {"axis": "col"}),
]


@pytest.mark.parametrize("name,params", CASES, ids=[f"{n}-{i}" for i, (n, _) in enumerate(CASES)])
@pytest.mark.parametrize("g", [64, 256])
def test_smooth_matches_reference(ref, name, params, g):
    W = _W()
    cls = {
        "percentile": "SmoothPercentile",
        "percentile_asym": "SmoothPercentileAsymmetric",
        "mad": "SmoothMAD",
        "outlier": "SmoothOutlier",
        "softnorm": "SmoothSoftNorm",
        "log": "SmoothLog",
        "rowcol": "SmoothRowCol",
    }[name]
    m = getattr(ref["_stub"], cls)(**params)
    # reference smooths chunkwise W[:, start:start+g] (gptq.py:705-723)
    outs = []
    for s in range(0, W.shape[1], g):
        blk = torch.tensor(W[:, s : s + g])
        got, scale = ref["smooth_block"](blk, _FB(m), group_size=g)
        if scale is not None:
            pass  # rowcol: compare the scaled weight itself
        outs.append(got.numpy())
    expect = np.concatenate(outs, axis=1)

    got, row_scale = smooth_weight(W, {"type": name, **params}, group_size=g)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)
    if name == "rowcol":
        assert row_scale is not None and row_scale.shape == (W.shape[1] // g, W.shape[0])
        np.testing.assert_allclose(
            got * np.repeat(row_scale.T, g, axis=1), W, rtol=2e-5
        )


@pytest.mark.parametrize("sym", [True, False])
@pytest.mark.parametrize("g", [64, 128])
def test_mse_shrink_matches_reference(ref, sym, g):
    W = _W(seed=3, rows=8, cols=256)
    qcfg = types.SimpleNamespace(sym=sym)
    maxq = 2**4 - 1

    deqs, scs, zrs = [], [], []
    for s in range(0, W.shape[1], g):
        d, sc, z = ref["mse_optimal_quant"](
            torch.tensor(W[:, s : s + g]), qcfg, maxq, steps=32, maxshrink=0.8
        )
        deqs.append(d.numpy())
        scs.append(sc.numpy())
        zrs.append(z.numpy())
    exp_deq = np.concatenate(deqs, axis=1)
    exp_sc = np.concatenate(scs, axis=1)
    exp_z = np.concatenate(zrs, axis=1)

    deq, sc, z = mse_shrink_quant(W, bits=4, sym=sym, group_size=g,
                                  steps=32, maxshrink=0.8)
    np.testing.assert_allclose(sc, exp_sc, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(z, exp_z, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(deq, exp_deq, rtol=1e-4, atol=1e-5)


def test_group_threshold_gate():
    W = _W(seed=5)
    got, _ = smooth_weight(W, "percentile", group_size=32, group_threshold=128)
    np.testing.assert_array_equal(got, W)  # gated off, identity
    got2, _ = smooth_weight(W, "percentile", group_size=256, group_threshold=128)
    assert np.abs(got2).max() < np.abs(W).max()
