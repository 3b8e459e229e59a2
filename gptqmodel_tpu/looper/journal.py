"""Mid-quant durability: per-layer journal + resume.

Analog of the reference's incremental offload — each finished module is
persisted to disk as the loop advances (looper/stage_layer.py:726-760,
utils/offload.py:131 torch.save per module; models/writer.py:399 ``split_by``
layer-dir streaming) — so a multi-hour 70B/MoE quantization that dies at
layer 60 resumes from layer 60, not from zero.

Journal layout (``<dir>/``):
  meta.json          — config/calibration fingerprint + done-layer list
  layer_%04d.pkl     — the finished layer's output tree (QuantLinear leaves,
                       numpy-backed; pickle, like the reference's torch.save)
                       + that layer's quant_log rows
  state.npz          — replay activations AFTER the newest finished layer
                       (exact f32 — resume is bit-identical), overwritten
                       atomically each layer; only the newest is needed

Resume contract: fingerprints (qcfg dict + calibration ids/mask bytes +
model dir) must match, else the journal is ignored and rebuilt. All writes
are tmp+rename atomic so a kill -9 mid-write never corrupts the journal.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import pickle
import time
from pathlib import Path

import numpy as np

log = logging.getLogger("gptqmodel_tpu")

_FMT = "layer_%04d.pkl"


def _fingerprint(qcfg_dict: dict, ids: np.ndarray, mask: np.ndarray,
                 model_dir: str) -> str:
    h = hashlib.sha256()
    h.update(json.dumps(qcfg_dict, sort_keys=True, default=str).encode())
    h.update(np.ascontiguousarray(ids).tobytes())
    h.update(np.ascontiguousarray(mask).tobytes())
    h.update(str(model_dir).encode())
    return h.hexdigest()


def _atomic_write(path: Path, write_fn):
    tmp = path.with_suffix(path.suffix + f".tmp{os.getpid()}")
    try:
        write_fn(tmp)
        os.replace(tmp, path)
    finally:
        if tmp.exists():
            tmp.unlink(missing_ok=True)


class QuantJournal:
    """Per-layer quantization journal. ``None``-safe: all methods no-op when
    constructed with ``dir=None`` so the loop stays branch-free."""

    def __init__(self, dir: str | os.PathLike | None, qcfg_dict: dict | None = None,
                 ids: np.ndarray | None = None, mask: np.ndarray | None = None,
                 model_dir: str = ""):
        self.dir = Path(dir) if dir else None
        if self.dir is None:
            self.fp = None
            return
        self.dir.mkdir(parents=True, exist_ok=True)
        self.fp = _fingerprint(qcfg_dict or {}, ids, mask, model_dir)

    # -- write side ---------------------------------------------------------

    def save_layer(self, li: int, layer_out, rows: list[dict],
                   hidden: list[np.ndarray],
                   hidden_fp: list[np.ndarray] | None = None):
        """Persist one finished layer + the post-replay activations."""
        if self.dir is None:
            return
        import jax

        t0 = time.perf_counter()
        tree = jax.device_get(layer_out)  # numpy-backed, structure preserved
        _atomic_write(
            self.dir / (_FMT % li),
            lambda p: p.write_bytes(pickle.dumps({"layer": li, "tree": tree,
                                                  "rows": rows})),
        )

        def write_state(p: Path):
            arrs = {f"h{b}": np.asarray(h) for b, h in enumerate(hidden)}
            if hidden_fp is not None:
                arrs.update({f"f{b}": np.asarray(h) for b, h in enumerate(hidden_fp)})
            arrs["li"] = np.asarray(li)
            with open(p, "wb") as f:
                np.savez(f, **arrs)

        _atomic_write(self.dir / "state.npz", write_state)

        meta = self._read_meta() or {"fingerprint": self.fp, "done": []}
        if li not in meta["done"]:
            meta["done"] = sorted(meta["done"] + [li])
        _atomic_write(
            self.dir / "meta.json",
            lambda p: p.write_text(json.dumps(meta)),
        )
        log.info("journal: layer %d persisted in %.2fs", li, time.perf_counter() - t0)

    def finalize(self):
        """Quant completed — remove the journal (the real checkpoint exists)."""
        if self.dir is None or not self.dir.exists():
            return
        for f in self.dir.iterdir():
            f.unlink(missing_ok=True)
        try:
            self.dir.rmdir()
        except OSError:
            pass

    # -- read side ----------------------------------------------------------

    def _read_meta(self):
        try:
            return json.loads((self.dir / "meta.json").read_text())
        except (OSError, ValueError):
            return None

    def resume_point(self):
        """Returns (next_layer, out_layers, rows, hidden, hidden_fp) or None.

        next_layer = the first layer NOT yet persisted; requires a contiguous
        done-prefix 0..n-1 with matching fingerprint and a state.npz written
        at layer n-1."""
        if self.dir is None:
            return None
        meta = self._read_meta()
        if not meta or meta.get("fingerprint") != self.fp:
            if meta:
                log.warning("journal: fingerprint mismatch — ignoring %s", self.dir)
            return None
        done = meta.get("done", [])
        n = 0
        while n in done:
            n += 1
        if n == 0:
            return None
        try:
            with np.load(self.dir / "state.npz") as z:
                if int(z["li"]) != n - 1:
                    log.warning("journal: state.npz is for layer %d, need %d — "
                                "ignoring", int(z["li"]), n - 1)
                    return None
                hidden = [z[f"h{b}"] for b in range(
                    len([k for k in z.files if k.startswith("h")]))]
                fkeys = [k for k in z.files if k.startswith("f")]
                hidden_fp = [z[f"f{b}"] for b in range(len(fkeys))] or None
            out_layers, rows = [], []
            for li in range(n):
                d = pickle.loads((self.dir / (_FMT % li)).read_bytes())
                out_layers.append(d["tree"])
                rows.extend(d["rows"])
        except (OSError, KeyError, pickle.UnpicklingError) as e:
            log.warning("journal: unreadable (%s) — starting fresh", e)
            return None
        log.info("journal: resuming at layer %d (%d layers restored)", n, n)
        return n, out_layers, rows, hidden, hidden_fp
