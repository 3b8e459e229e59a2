"""Session V: on-chip validation + timing of the whole-solve mega-kernel
(ops/pallas_gptq.gptq_whole_solve) and the divide-and-conquer Hessian
triangular inverse.

A/B inside ONE process (chip drift is +-5% between processes), base last:
  1. gate|up concat shape 28672x4096 g128 sym: xla vs mega (codes compared)
  2. qkv concat 6144x4096, o 4096x4096: mega timing
  3. down 4096x14336: mega_row_tile correctly falls back; time the solve
     anyway (tri-inv change) and the hessian_inverse alone at 14336.
"""
import logging, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(level=logging.INFO, format="%(message)s", stream=sys.stdout)
import numpy as np, jax
print("devices:", jax.devices(), flush=True)

from gptqmodel_tpu.quantization.gptq import gptq_quantize, hessian_inverse

rng = np.random.default_rng(0)


def make(out_f, in_f, seed=0):
    r = np.random.default_rng(seed)
    W = (r.standard_normal((out_f, in_f)) * 0.02).astype(np.float32)
    X = r.standard_normal((2048, in_f)).astype(np.float32)
    H = (2.0 / 2048) * (X.T @ X)
    return W, H


def run(tag, W, H, mode, **kw):
    os.environ["GPTQ_TPU_SOLVER"] = mode
    t0 = time.time()
    r = gptq_quantize(W, H, nsamples=2048, **kw)
    dt = time.time() - t0
    print(f"{tag} solver={mode}: {dt:.1f}s loss={r.avg_loss:.6f}", flush=True)
    return dt, r


KW = dict(bits=4, group_size=128, sym=True)

# --- gate|up: warm each mode once (compile), then timed pass, base last ---
W, H = make(28672, 4096)
run("gateup/warm", W, H, "mega", **KW)
t_mega, r_mega = run("gateup", W, H, "mega", **KW)
run("gateup/warm", W, H, "xla", **KW)
t_xla, r_xla = run("gateup", W, H, "xla", **KW)
frac = float((r_mega.Q != r_xla.Q).mean())
wq = float(np.abs(r_mega.Wq - r_xla.Wq).max())
print(f"gateup codes diff frac {frac:.2e}; max|dWq| {wq:.2e}; "
      f"speedup {t_xla / t_mega:.2f}x", flush=True)

# asym + desc_act variant correctness on chip (different kernel paths)
KW2 = dict(bits=4, group_size=128, sym=False, desc_act=True)
Ws, Hs = make(4096, 4096, seed=3)
_, ra = run("o-asym-desc", Ws, Hs, "mega", **KW2)
_, rb = run("o-asym-desc", Ws, Hs, "xla", **KW2)
frac2 = float((ra.Q != rb.Q).mean())
print(f"asym/desc codes diff frac {frac2:.2e}", flush=True)

# --- qkv + o shapes, mega timing ---
Wq_, Hq_ = make(6144, 4096, seed=1)
run("qkv/warm", Wq_, Hq_, "mega", **KW)
run("qkv", Wq_, Hq_, "mega", **KW)

# --- down: falls back (in_f=14336 slab > VMEM) but tri-inv is the new path --
Wd, Hd = make(4096, 14336, seed=2)
t0 = time.time()
U, damp = hessian_inverse(Hd, 0.01)
U.block_until_ready()
print(f"hessian_inverse(14336) cold: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
U, damp = hessian_inverse(Hd, 0.01)
U.block_until_ready()
print(f"hessian_inverse(14336) warm: {time.time()-t0:.1f}s", flush=True)
run("down/warm", Wd, Hd, "mega", **KW)
run("down", Wd, Hd, "mega", **KW)

print("DONE", flush=True)
