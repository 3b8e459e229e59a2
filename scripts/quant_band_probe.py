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


def run_quality_probe(layers: int = 2):
    """Held-out quality companion to the throughput probe (VERDICT r4 #7):
    quantize the same llama-8B-shaped pipeline, then measure token-level
    perplexity of the FP model vs the quantized model on HELD-OUT rows
    (never seen by the Hessians). Returns (ppl_fp, ppl_q, ratio).

    The ratio (quant/fp) is the recorded band constant: it regresses if a
    solver/kernel change degrades solve QUALITY at 8B shapes, the gap the
    speed bands alone cannot see."""
    import numpy as np
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    import jax.numpy as jnp

    from gptqmodel_tpu import GPTQModel, QuantizeConfig
    from gptqmodel_tpu.models.transformer import forward_logits

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
        held = np.asarray(
            [rng.integers(1, 32000, size=(128,)) for _ in range(4)],
            np.int32)

        def logprobs(spec, params):
            lg = np.asarray(forward_logits(
                spec, params, jnp.asarray(held)), np.float32)  # [B, T, V]
            return lg - np.log(np.exp(
                lg - lg.max(-1, keepdims=True)).sum(-1, keepdims=True)) \
                - lg.max(-1, keepdims=True)

        def ppl(lp):
            tgt = held[:, 1:]
            nll = -np.take_along_axis(
                lp[:, :-1], tgt[..., None], axis=-1)[..., 0]
            return float(np.exp(nll.mean()))

        from gptqmodel_tpu.models.definitions import get_model_def
        from gptqmodel_tpu.models.loader import (
            CheckpointReader, build_params_tree)
        m_fp = GPTQModel.load(src, QuantizeConfig(bits=4, group_size=128))
        reader = CheckpointReader(src)
        mdef = get_model_def(
            m_fp.spec.model_type, tensor_names=reader.names())
        dense = build_params_tree(
            mdef.wrap_reader(reader, m_fp.hf_config),
            conv1d_suffixes=mdef.conv1d_suffixes)
        lp_fp = logprobs(m_fp.spec, dense)
        del dense

        m = GPTQModel.load(
            src, QuantizeConfig(bits=4, group_size=128, pack_workers=2))
        m.quantize(calib, batch_size=4)
        lp_q = logprobs(m.spec, m.params)
        ppl_fp, ppl_q = ppl(lp_fp), ppl(lp_q)
        # fidelity metrics MONOTONE in quantization error (ppl ratio on a
        # random-init probe model is not): fp-vs-quant top-1 agreement and
        # mean KL(fp || quant) over held-out positions
        agree = float(np.mean(
            np.argmax(lp_fp, -1) == np.argmax(lp_q, -1)))
        kl = float(np.mean(
            np.sum(np.exp(lp_fp) * (lp_fp - lp_q), axis=-1)))
        out = {"ppl_fp": ppl_fp, "ppl_q": ppl_q,
               "ppl_ratio": ppl_q / ppl_fp, "top1_agreement": agree,
               "kl_fp_q": kl}
        print("held-out quality: " + " ".join(
            f"{k}={v:.5f}" for k, v in out.items()), flush=True)
        return out


if __name__ == "__main__":
    if os.environ.get("QUANT_PROBE_QUALITY") == "1":
        print(run_quality_probe(int(os.environ.get("QUANT_PROBE_LAYERS", "2"))))
    else:
        print(run_probe(int(os.environ.get("QUANT_PROBE_LAYERS", "2"))))
