"""On-chip verify: EXL3 trellis quantize -> pack -> TrellisLinear forward."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
print('platform:', jax.devices(), flush=True)
from gptqmodel_tpu.quantization.exl3 import prepare_exl3_hessian, quantize_exl3, dequantize_exl3
from gptqmodel_tpu.ops.trellis import make_trellis_linear, post_init_trellis, trellis_forward, trellis_dequantize

rng = np.random.default_rng(0)
k, n = 256, 256
W = rng.standard_normal((k, n)).astype(np.float32) * 0.05   # (in, out)
X = rng.standard_normal((512, k)).astype(np.float32)
X[:, :k//4] *= 4.0
H = X.T @ X / 512
Hd = prepare_exl3_hessian(H, seed=0)
res = quantize_exl3(W, Hd, K=4, cb="mcg")
print('proxy_err:', res.proxy_err, flush=True)
p = post_init_trellis(make_trellis_linear(trellis=res.trellis, suh=res.suh, svh=res.svh, bias=None, K=4, cb="mcg"))
W_host = dequantize_exl3(res.trellis, res.suh, res.svh, 4, "mcg")
W_rt = np.asarray(trellis_dequantize(p))
print('decode max-abs-diff vs host:', float(np.max(np.abs(W_rt - W_host))), flush=True)
x = jnp.asarray(X[:8], jnp.float32)
y = np.asarray(trellis_forward(p, x))
y_ref = X[:8] @ W_host
rel_dec = float(np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref))
y_fp = X[:8] @ W
rel_fp = float(np.linalg.norm(y - y_fp) / np.linalg.norm(y_fp))
print('forward rel-vs-dequant:', rel_dec, ' rel-vs-fp:', rel_fp, flush=True)
assert rel_dec < 0.02 and rel_fp < 0.12
print('EXL3 on-chip verify OK', flush=True)
