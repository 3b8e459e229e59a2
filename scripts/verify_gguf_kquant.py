"""On-TPU verify: tiny llama -> export_gguf(q4_k/q6_k) -> load_gguf -> forward.

Library-surface drive for the new K-quant GGUF encoders (utils/gguf.py
quant_q4_k/quant_q6_k wired into models/gguf_model.export_gguf).
"""
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

print("platform:", jax.devices(), flush=True)

from tests.test_transformer import _jax_logits, _tiny_llama_dir  # noqa: E402
from gptqmodel_tpu import GPTQModel  # noqa: E402
from gptqmodel_tpu.models.gguf_model import export_gguf  # noqa: E402
from gptqmodel_tpu.models.transformer import forward_logits  # noqa: E402

with tempfile.TemporaryDirectory() as tmp:
    # hidden sizes divisible by 256 so K-quant blocks engage
    d, _ = _tiny_llama_dir(tmp, "llama", intermediate_size=256)
    spec, params, ids, dense_logits = _jax_logits(d)
    for qt, tol in [("q4_k", 0.25), ("q6_k", 0.05)]:
        gpath = Path(tmp) / f"m-{qt}.gguf"
        export_gguf(gpath, spec, params, quant_type=qt)
        m = GPTQModel.load_gguf(gpath)
        got = np.asarray(
            forward_logits(m.spec, m.params, jnp.asarray(ids), dtype=jnp.float32)
        )
        rel = np.linalg.norm(got - dense_logits) / np.linalg.norm(dense_logits)
        gen = m.generate(np.arange(1, 7).reshape(1, 6), max_new_tokens=3,
                         dtype=jnp.float32)
        print(f"{qt}: file={gpath.stat().st_size}B rel={rel:.4f} "
              f"gen={gen.shape} ok={rel < tol}", flush=True)
        assert rel < tol, (qt, rel)

print("VERIFY-OK", flush=True)
