"""Mid-quant durability: per-layer journal, crash, resume, byte-identical.

Reference analog: incremental module offload (stage_layer.py:726-760) — a
killed quantization must resume from the last persisted layer and produce
exactly the checkpoint an uninterrupted run would have produced.
"""

import tempfile
from pathlib import Path

import numpy as np
import pytest

from gptqmodel_tpu import GPTQModel, QuantizeConfig
from gptqmodel_tpu.looper import journal as journal_mod
from gptqmodel_tpu.models.writer import flatten_params

from tests.test_e2e_quantize import _calib, _make_tiny


def _flat_bytes(params):
    flat = flatten_params(params)
    return {k: np.asarray(v).tobytes() for k, v in flat.items()}


def test_crash_resume_byte_identical(monkeypatch):
    calib = _calib(8, 32)
    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)  # 2 layers
        jdir = Path(tmp) / "journal"

        # run A: uninterrupted, no journal — the ground-truth checkpoint
        a = GPTQModel.load(src, QuantizeConfig(bits=4, group_size=32))
        a.quantize(calib, batch_size=4)
        truth = _flat_bytes(a.params)

        # run B: journaled, die immediately after layer 0 persists
        real_save = journal_mod.QuantJournal.save_layer

        def dying_save(self, li, *a, **k):
            real_save(self, li, *a, **k)
            if li == 0:
                raise KeyboardInterrupt("simulated kill after layer 0")

        monkeypatch.setattr(journal_mod.QuantJournal, "save_layer", dying_save)
        b = GPTQModel.load(
            src, QuantizeConfig(bits=4, group_size=32, journal=str(jdir)))
        with pytest.raises(KeyboardInterrupt):
            b.quantize(calib, batch_size=4)
        monkeypatch.setattr(journal_mod.QuantJournal, "save_layer", real_save)
        assert (jdir / "layer_0000.pkl").exists()
        assert (jdir / "state.npz").exists()

        # run C: resume — layer 0 restored from disk, only layer 1 re-solved
        solved_layers = []
        from gptqmodel_tpu.looper import quantize_loop as ql

        real_group = ql._quantize_group

        def spy_group(grp, lp, H, n_rows, layer_idx, *a, **k):
            solved_layers.append(layer_idx)
            return real_group(grp, lp, H, n_rows, layer_idx, *a, **k)

        monkeypatch.setattr(ql, "_quantize_group", spy_group)
        c = GPTQModel.load(
            src, QuantizeConfig(bits=4, group_size=32, journal=str(jdir)))
        rows = c.quantize(calib, batch_size=4)
        assert 0 not in solved_layers and 1 in solved_layers
        assert len(rows) == 2 * 7  # restored rows + resumed rows

        got = _flat_bytes(c.params)
        assert got.keys() == truth.keys()
        for k in truth:
            assert got[k] == truth[k], f"tensor {k} differs after resume"
        assert not jdir.exists()  # journal cleaned up on completion


def test_fingerprint_mismatch_restarts(monkeypatch):
    """A journal from a different config/calibration must be ignored."""
    calib = _calib(8, 32)
    with tempfile.TemporaryDirectory() as tmp:
        src = _make_tiny(tmp)
        jdir = Path(tmp) / "journal"

        real_save = journal_mod.QuantJournal.save_layer

        def dying_save(self, li, *a, **k):
            real_save(self, li, *a, **k)
            if li == 0:
                raise KeyboardInterrupt

        monkeypatch.setattr(journal_mod.QuantJournal, "save_layer", dying_save)
        m = GPTQModel.load(
            src, QuantizeConfig(bits=4, group_size=32, journal=str(jdir)))
        with pytest.raises(KeyboardInterrupt):
            m.quantize(calib, batch_size=4)
        monkeypatch.setattr(journal_mod.QuantJournal, "save_layer", real_save)

        solved_layers = []
        from gptqmodel_tpu.looper import quantize_loop as ql

        real_group = ql._quantize_group

        def spy_group(grp, lp, H, n_rows, layer_idx, *a, **k):
            solved_layers.append(layer_idx)
            return real_group(grp, lp, H, n_rows, layer_idx, *a, **k)

        monkeypatch.setattr(ql, "_quantize_group", spy_group)
        # different group_size -> fingerprint mismatch -> full restart
        m2 = GPTQModel.load(
            src, QuantizeConfig(bits=4, group_size=64, journal=str(jdir)))
        m2.quantize(calib, batch_size=4)
        assert 0 in solved_layers  # layer 0 was re-quantized, not restored
