"""Session U: on-chip validation + timing of the Pallas GPTQ block solver.

Same 2-layer llama-8B-shaped flow as session S3, solver xla vs pallas in
one process; asserts the packed outputs agree, records per-layer solve time.
"""
import logging, os, sys, tempfile, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(level=logging.INFO, format="%(message)s", stream=sys.stdout)
import numpy as np, jax
print("devices:", jax.devices(), flush=True)

# direct solver A/B at the hot shape first (cheap, decisive)
from gptqmodel_tpu.quantization.gptq import gptq_quantize
rng = np.random.default_rng(0)
out_f, in_f = 28672, 4096   # gate|up concat
W = (rng.standard_normal((out_f, in_f)) * 0.02).astype(np.float32)
X = rng.standard_normal((2048, in_f)).astype(np.float32)
H = (2.0 / 2048) * (X.T @ X)
res = {}
for mode in ("xla", "pallas", "xla"):
    os.environ["GPTQ_TPU_SOLVER"] = mode
    t0 = time.time()
    r = gptq_quantize(W, H, bits=4, group_size=128, sym=True, nsamples=2048)
    dt = time.time() - t0
    key = mode + ("2" if mode in res else "")
    res[key] = (dt, r)
    print(f"solver={mode}: {dt:.1f}s  loss={r.avg_loss:.6f}", flush=True)
os.environ.pop("GPTQ_TPU_SOLVER", None)
a, b = res["xla"][1], res["pallas"][1]
same = np.array_equal(a.Q, b.Q)
close = np.allclose(a.Wq, b.Wq, rtol=1e-5, atol=1e-6)
frac = float((a.Q != b.Q).mean())
print(f"codes identical: {same} (diff frac {frac:.2e}); Wq close: {close}", flush=True)
print(f"loss xla={a.avg_loss:.6f} pallas={b.avg_loss:.6f}", flush=True)
# down-proj shape too
out_f, in_f = 4096, 14336
W2 = (rng.standard_normal((out_f, in_f)) * 0.02).astype(np.float32)
X2 = rng.standard_normal((2048, in_f)).astype(np.float32)
H2 = (2.0 / 2048) * (X2.T @ X2)
for mode in ("xla", "pallas"):
    os.environ["GPTQ_TPU_SOLVER"] = mode
    t0 = time.time()
    r = gptq_quantize(W2, H2, bits=4, group_size=128, sym=True, nsamples=2048)
    print(f"down {mode}: {time.time()-t0:.1f}s loss={r.avg_loss:.6f}", flush=True)
os.environ.pop("GPTQ_TPU_SOLVER", None)
print("DONE", flush=True)
