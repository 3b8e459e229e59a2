"""On-TPU verify: unknown model_type -> auto-detected tree -> quantize -> infer.

Drives GPTQModel.load + quantize + generate on a tiny llama-shaped checkpoint
whose model_type is renamed to an unregistered string, so the looper resolves
its module tree via models/tree_detect.py detection.
"""
import json
import sys
import tempfile
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

print("platform:", jax.devices(), flush=True)

from tests.test_e2e_quantize import _calib, _make_tiny  # noqa: E402
from gptqmodel_tpu import GPTQModel, QuantizeConfig  # noqa: E402

with tempfile.TemporaryDirectory() as tmp:
    src = _make_tiny(tmp)
    cfg_path = src / "config.json"
    cfg = json.loads(cfg_path.read_text())
    cfg["model_type"] = "frontier_llm_2030"
    cfg.pop("architectures", None)
    cfg_path.write_text(json.dumps(cfg))

    m = GPTQModel.load(src, QuantizeConfig(bits=4, group_size=32))
    rows = m.quantize(_calib(8), batch_size=4)
    print("quantized modules:", len(rows), flush=True)
    assert len(rows) == 2 * 7, len(rows)
    assert any("self_attn.q_proj" in r["module"] for r in rows)
    gen = m.generate(np.arange(1, 9).reshape(1, 8), max_new_tokens=4,
                     dtype=jnp.float32)
    print("gen:", gen.shape, flush=True)

print("VERIFY-OK", flush=True)
