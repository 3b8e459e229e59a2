"""looper — layer-by-layer quantization orchestration (reference gptqmodel/looper/)."""
