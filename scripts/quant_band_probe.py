"""Warm quant-throughput probe backing the speed band
(tests/test_speed_bands.py::test_quant_throughput_band).

Distilled from scripts/tpu_session_x.py: llama-8B-shaped layers (4096h /
14336i), calib 16x128, GPTQ-4 g128, mega solver default. Returns the LAST
layer's summed module solve time (the warm sample — earlier layers absorb
the cold compiles). Recorded r3 value: 57-64 s/layer (session X/X2).
"""
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_probe(layers: int = 2) -> float:
    import numpy as np
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    with tempfile.TemporaryDirectory() as work:
        src = work + "/llama8b_shape"
        cfg = AutoConfig.for_model(
            model_type="llama", vocab_size=32000, hidden_size=4096,
            intermediate_size=14336, num_hidden_layers=layers,
            num_attention_heads=32, num_key_value_heads=8,
            max_position_embeddings=4096, tie_word_embeddings=False)
        torch.manual_seed(0)
        AutoModelForCausalLM.from_config(cfg).to(
            torch.float16).eval().save_pretrained(
            src, safe_serialization=True, max_shard_size="2GB")

        rng = np.random.default_rng(0)
        calib = [rng.integers(1, 32000, size=(128,)) for _ in range(16)]
        m = GPTQModel.load(
            src, QuantizeConfig(bits=4, group_size=128, pack_workers=2))
        rows = m.quantize(calib, batch_size=4)
        per_layer = {}
        for r in rows:
            per_layer[r["layer"]] = per_layer.get(r["layer"], 0.0) + r["time_s"]
        warm = per_layer[max(per_layer)]
        print(f"per-layer solve sums: "
              f"{ {k: round(v, 1) for k, v in sorted(per_layer.items())} } "
              f"-> warm {warm:.1f}s", flush=True)
        return warm


if __name__ == "__main__":
    print(run_probe(int(os.environ.get("QUANT_PROBE_LAYERS", "2"))))
