"""Minimal repro: 14336-wide GPTQ solve memory on one v5e chip."""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)

def mem(tag):
    s = jax.local_devices()[0].memory_stats() or {}
    print(f"{tag}: {s.get(chr(39)+chr(98)+chr(121)+chr(116)+chr(101)+chr(115)+chr(95)+chr(105)+chr(110)+chr(95)+chr(117)+chr(115)+chr(101)+chr(39),0)/2**30:.2f} GiB in use "
          f"(peak {s.get('peak_bytes_in_use',0)/2**30:.2f})", flush=True)

n, out = 14336, 4096
rng = np.random.default_rng(0)
A = rng.standard_normal((n, 256)).astype(np.float32)
H = jnp.asarray(A @ A.T / 256 + 0.1 * np.eye(n, dtype=np.float32))
W = jnp.asarray(rng.standard_normal((out, n)).astype(np.float32) * 0.02)
mem("after H+W")

from gptqmodel_tpu.quantization.gptq import hessian_inverse, gptq_quantize
t0 = time.time()
U, damp = hessian_inverse(np.asarray(H), 0.01)
jax.block_until_ready(U)
mem(f"after hessian_inverse ({time.time()-t0:.1f}s)")

t0 = time.time()
res = gptq_quantize(W, H, bits=4, group_size=128, sym=True, nsamples=256)
print(f"gptq_quantize ok in {time.time()-t0:.1f}s loss={res.avg_loss:.6f}", flush=True)
mem("after solve")
print("DONE", flush=True)
