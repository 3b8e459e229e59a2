"""Calibration data pipeline.

Reference behavior being reproduced (gptqmodel/models/base.py:801-812,
utils/calibration.py): accept raw text / pre-tokenized ids, optional
concatenation to fixed-size rows, length sort, batching with pad masks, and
minimum-size warnings (256 rows / 256 avg tokens).

TPU-specific design: every batch is padded to ONE global static shape so the
capture/Hessian step compiles once and is reused across all batches and all
layers (XLA retraces on shape change; ragged batches would recompile per
batch).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

log = logging.getLogger("gptqmodel_tpu")

MIN_CALIBRATION_ROWS = 256
MIN_CALIBRATION_AVG_TOKENS = 256


@dataclass
class CalibrationBatches:
    input_ids: np.ndarray  # [n_batches, B, T] int32 (0-padded)
    row_mask: np.ndarray  # [n_batches, B, T] f32 (1 = real token)
    # multimodal (IMAGE/AUDIO) calibration: per-row precomputed non-text
    # embeddings, merged into the embedded batch at placeholder-token
    # positions (the HF VL merge: inputs_embeds[ids == image_token] =
    # features). mm_embeds[b][j] is [n_mm, H] or None. Reference analog:
    # per-arch prepare_dataset feeding real image/audio batches through the
    # processor (gptqmodel/models/definitions/ovis.py:129, base.py:775);
    # TPU-native form accepts the tower's OUTPUT embeddings so text-tower
    # Hessians see visual-context activations.
    mm_embeds: list | None = None
    image_token_id: int = -1

    @property
    def n_batches(self) -> int:
        return self.input_ids.shape[0]

    @property
    def total_tokens(self) -> int:
        return int(self.row_mask.sum())

    def merge_mm(self, hidden_b: np.ndarray, b: int) -> np.ndarray:
        """Scatter row mm embeddings into embedded batch ``b`` ([B, T, H],
        modified in place) at placeholder positions, in reading order.
        Extra placeholders (beyond the supplied embeddings) stay at the
        text embedding; extra embeddings are dropped with a warning."""
        if self.mm_embeds is None:
            return hidden_b
        for j, emb in enumerate(self.mm_embeds[b]):
            if emb is None:
                continue
            pos = np.nonzero(self.input_ids[b, j] == self.image_token_id)[0]
            n = min(len(pos), emb.shape[0])
            if n < emb.shape[0]:
                log.warning(
                    "mm calibration row (%d,%d): %d embeddings for %d "
                    "placeholder tokens; extra embeddings dropped",
                    b, j, emb.shape[0], len(pos))
            hidden_b[j, pos[:n]] = emb[:n].astype(hidden_b.dtype)
        return hidden_b


def prepare_calibration(
    data,
    tokenizer=None,
    batch_size: int = 4,
    max_length: int = 2048,
    concat_size: int | None = None,
    sort: str | None = "desc",
    pad_token_id: int = 0,
    image_token_id: int = -1,
) -> CalibrationBatches:
    """Normalize calibration input into fixed-shape batches + masks.

    ``data``: list of strings (needs tokenizer), list of 1-D int sequences,
    a 2-D int array, or dicts with ``input_ids`` (+ optional
    ``image_embeds`` for multimodal rows — see CalibrationBatches.mm_embeds).
    ``concat_size``: join-and-split all sequences into
    uniform rows of this length (reference calibration_concat_size).
    ``sort``: 'desc'|'asc'|None — length sort to reduce padding waste
    (reference calibration_sort). ``image_token_id``: placeholder id whose
    embedding slots receive mm embeddings (required when mm rows present).
    """
    rows, mm_rows = _to_token_rows(data, tokenizer, max_length)

    if concat_size:
        if any(m is not None for m in mm_rows):
            raise ValueError(
                "calibration_concat_size cannot be combined with "
                "multimodal (image_embeds) calibration rows")
        flat = np.concatenate(rows)
        n = len(flat) // concat_size
        rows = [flat[i * concat_size : (i + 1) * concat_size] for i in range(n)]
        mm_rows = [None] * len(rows)

    if len(rows) < MIN_CALIBRATION_ROWS:
        log.warning(
            "calibration has %d rows; reference recommends >= %d for stable "
            "Hessians", len(rows), MIN_CALIBRATION_ROWS,
        )
    avg = sum(len(r) for r in rows) / max(len(rows), 1)
    if avg < MIN_CALIBRATION_AVG_TOKENS:
        log.warning(
            "calibration rows average %.0f tokens; reference recommends >= %d",
            avg, MIN_CALIBRATION_AVG_TOKENS,
        )

    order = list(range(len(rows)))
    if sort == "desc":
        order.sort(key=lambda i: len(rows[i]), reverse=True)
    elif sort == "asc":
        order.sort(key=lambda i: len(rows[i]))
    rows = [rows[i] for i in order]
    mm_rows = [mm_rows[i] for i in order]

    T = min(max(len(r) for r in rows), max_length)
    n_batches = (len(rows) + batch_size - 1) // batch_size
    ids = np.full((n_batches, batch_size, T), pad_token_id, dtype=np.int32)
    mask = np.zeros((n_batches, batch_size, T), dtype=np.float32)
    mm = [[None] * batch_size for _ in range(n_batches)]
    has_mm = False
    for i, row in enumerate(rows):
        b, j = divmod(i, batch_size)
        L = min(len(row), T)
        ids[b, j, :L] = row[:L]
        mask[b, j, :L] = 1.0
        if mm_rows[i] is not None:
            mm[b][j] = mm_rows[i]
            has_mm = True
    if has_mm and image_token_id < 0:
        raise ValueError(
            "multimodal calibration rows require image_token_id (the "
            "placeholder id their embeddings replace)")
    return CalibrationBatches(
        input_ids=ids, row_mask=mask,
        mm_embeds=mm if has_mm else None,
        image_token_id=image_token_id)


def _to_token_rows(data, tokenizer, max_length: int):
    """-> (token rows, per-row mm embedding arrays or None).

    Dict items may carry ``image_embeds`` (alias ``inputs_embeds``,
    ``audio_embeds``): a [n_mm, H] float array of precomputed tower
    embeddings for that row's placeholder tokens."""
    rows: list[np.ndarray] = []
    mm: list = []
    if isinstance(data, np.ndarray) and data.ndim == 2:
        rows = [np.asarray(r, dtype=np.int32) for r in data]
        return rows, [None] * len(rows)
    for item in data:
        if isinstance(item, str):
            if tokenizer is None:
                raise ValueError("string calibration data requires a tokenizer")
            enc = tokenizer(item, truncation=True, max_length=max_length)
            rows.append(np.asarray(enc["input_ids"], dtype=np.int32))
            mm.append(None)
        elif isinstance(item, dict) and "input_ids" in item:
            ids = np.asarray(item["input_ids"], dtype=np.int32)
            rows.append(ids.reshape(-1))
            emb = None
            for k in ("image_embeds", "inputs_embeds", "audio_embeds"):
                if item.get(k) is not None:
                    emb = np.asarray(item[k], dtype=np.float32)
                    if emb.ndim != 2:
                        raise ValueError(
                            f"{k} must be [n_tokens, hidden], got "
                            f"{emb.shape}")
                    break
            mm.append(emb)
        else:
            rows.append(np.asarray(item, dtype=np.int32).reshape(-1))
            mm.append(None)
    return rows, mm
