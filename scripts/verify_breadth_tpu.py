import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import json, tempfile
from pathlib import Path
import numpy as np, jax, jax.numpy as jnp
print('platform:', jax.devices(), flush=True)

# 1. canonical quantize -> pack -> quantized forward
from gptqmodel_tpu.quantization.gptq import accumulate_hessian, init_hessian, gptq_quantize
from gptqmodel_tpu.ops.qlinear import make_quant_linear, qlinear_forward_xla
rng = np.random.default_rng(0)
W = rng.standard_normal((256, 512)).astype(np.float32) * 0.05
X = rng.standard_normal((1024, 512)).astype(np.float32)
H, n = init_hessian(512), jnp.int32(0)
H, n = accumulate_hessian(H, n, jnp.asarray(X))
res = gptq_quantize(W, H, bits=4, group_size=128, sym=True, nsamples=int(n))
p = make_quant_linear(Q=res.Q, scales=res.scales, zeros=res.zeros, g_idx=res.g_idx,
                      bias=None, bits=4, group_size=128, sym=True, v1=True)
x = jnp.asarray(X[:8], dtype=jnp.bfloat16)
y_q = qlinear_forward_xla(p, x); y_fp = x @ jnp.asarray(W.T, dtype=jnp.bfloat16)
rel = float(jnp.linalg.norm((y_q-y_fp).astype(jnp.float32))/jnp.linalg.norm(y_fp.astype(jnp.float32)))
print('canonical rel err:', rel, flush=True)
assert rel < 0.2

# 2. ovis-style VL prefix (llm.model.*) quantize -> save -> reload -> generate
from safetensors.numpy import save_file
from gptqmodel_tpu import GPTQModel, QuantizeConfig
def w(*shape): return (rng.standard_normal(shape) * 0.05).astype(np.float32)
tmp = tempfile.mkdtemp()
d = Path(tmp) / 'ovis'; d.mkdir()
h, heads, kvh, inter, V, L = 64, 4, 2, 128, 128, 2
t = {'llm.model.embed_tokens.weight': w(V, h), 'llm.model.norm.weight': np.ones(h, np.float32),
     'llm.lm_head.weight': w(V, h), 'visual.head.weight': np.zeros((4, 4), np.float32)}
for i in range(L):
    pfx = f'llm.model.layers.{i}.'
    t[pfx+'input_layernorm.weight'] = np.ones(h, np.float32)
    t[pfx+'post_attention_layernorm.weight'] = np.ones(h, np.float32)
    for nme, shp in [('self_attn.q_proj', (h, h)), ('self_attn.k_proj', (kvh*16, h)),
                     ('self_attn.v_proj', (kvh*16, h)), ('self_attn.o_proj', (h, h)),
                     ('mlp.gate_proj', (inter, h)), ('mlp.up_proj', (inter, h)),
                     ('mlp.down_proj', (h, inter))]:
        t[pfx+nme+'.weight'] = w(*shp)
save_file({k: np.ascontiguousarray(v) for k, v in t.items()}, d/'model.safetensors')
(d/'config.json').write_text(json.dumps(dict(model_type='ovis', llm_config=dict(
    model_type='llama', vocab_size=V, hidden_size=h, intermediate_size=inter,
    num_hidden_layers=L, num_attention_heads=heads, num_key_value_heads=kvh,
    rms_norm_eps=1e-6, max_position_embeddings=256, tie_word_embeddings=False))))
m = GPTQModel.load(d, QuantizeConfig(bits=4, group_size=32))
rows = m.quantize([rng.integers(1, V, size=(48,)) for _ in range(8)], batch_size=4)
print('ovis quant rows:', len(rows), flush=True)
out = Path(tmp)/'q'; m.save(out)
m2 = GPTQModel.load(out)
g = m2.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=4)
print('ovis generate:', np.asarray(g).shape, flush=True)
print('VERIFY_OK', flush=True)
