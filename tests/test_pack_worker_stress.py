"""Pack-worker race stress (closes VERDICT r3 §5.2 🟡).

``qcfg.pack_workers=2`` runs host packing and journal writes in a
ThreadPoolExecutor concurrently with the next subset's device solve
(reference discipline analog: threadx.py:158-298 serialized pools). The
journal device_get race was found by accident in round 3 (commit c891b00);
this test hammers the interleavings ON PURPOSE: randomized sleeps are
injected into the pack constructor and the journal writer so the futures
resolve in shuffled orders relative to the solve/replay loop, across
several schedules — and the packed checkpoint must stay byte-identical to
the pack_workers=0 run every time.
"""

import hashlib
import tempfile
from pathlib import Path

import numpy as np
import pytest

from tests.test_e2e_quantize import _calib, _make_tiny


def _save_digest(m, out_dir: Path) -> dict[str, str]:
    """Weights hashed byte-exact; configs normalized first (they record the
    runtime knobs under test — pack_workers/journal legitimately differ)."""
    import json

    m.save(out_dir)
    out = {}
    for p in sorted(out_dir.iterdir()):
        if p.suffix == ".safetensors":
            out[p.name] = hashlib.sha256(p.read_bytes()).hexdigest()
        elif p.suffix == ".json":
            cfg = json.loads(p.read_text())
            for section in (cfg, cfg.get("quantization_config", {})):
                for k in ("pack_workers", "journal"):
                    section.pop(k, None)
            out[p.name] = hashlib.sha256(
                json.dumps(cfg, sort_keys=True).encode()).hexdigest()
    return out


def _quantize_once(src, tmp: Path, tag: str, pack_workers: int,
                   journal: bool):
    from gptqmodel_tpu import GPTQModel, QuantizeConfig

    qcfg = QuantizeConfig(bits=4, group_size=32, pack_workers=pack_workers)
    if journal:
        qcfg.journal = str(tmp / f"journal_{tag}")
    m = GPTQModel.load(src, qcfg)
    rows = m.quantize(_calib(8, 48), batch_size=4)
    return m, rows, _save_digest(m, tmp / f"out_{tag}")


def test_pack_worker_stress_byte_identical(monkeypatch):
    import gptqmodel_tpu.looper.quantize_loop as ql
    from gptqmodel_tpu.looper.journal import QuantJournal

    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        src = _make_tiny(tmp, num_hidden_layers=4)

        _, rows0, base_digest = _quantize_once(
            src, tmp, "serial", pack_workers=0, journal=True)

        real_make = ql.make_quant_linear
        real_save = QuantJournal.save_layer

        for seed in (0, 1, 2):  # three adversarial schedules
            rng = np.random.default_rng(seed)
            import time as _t

            def slow_make(*a, _rng=rng, **kw):
                _t.sleep(float(_rng.uniform(0.0, 0.05)))
                return real_make(*a, **kw)

            def slow_save(self, *a, _rng=rng, **kw):
                _t.sleep(float(_rng.uniform(0.0, 0.05)))
                return real_save(self, *a, **kw)

            monkeypatch.setattr(ql, "make_quant_linear", slow_make)
            monkeypatch.setattr(QuantJournal, "save_layer", slow_save)
            try:
                _, rows, digest = _quantize_once(
                    src, tmp, f"stress{seed}", pack_workers=2, journal=True)
            finally:
                monkeypatch.setattr(ql, "make_quant_linear", real_make)
                monkeypatch.setattr(QuantJournal, "save_layer", real_save)

            assert digest == base_digest, (
                f"schedule {seed}: overlapped pack produced different bytes")
            # stat rows carry the same losses module-by-module
            k = lambda r: (r["module"],)
            for a, b in zip(sorted(rows0, key=k), sorted(rows, key=k)):
                assert a["module"] == b["module"]
                assert np.isclose(a["loss"], b["loss"], rtol=1e-6), a["module"]
