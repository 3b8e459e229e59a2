"""Calibration pipeline unit tests (reference utils/calibration coverage)."""

import numpy as np

from gptqmodel_tpu.looper.calibration import prepare_calibration


def test_batching_and_masks():
    rows = [np.arange(1, n) for n in (5, 9, 13, 3, 7)]
    cb = prepare_calibration(rows, batch_size=2, sort=None)
    assert cb.input_ids.shape[0] == 3  # ceil(5/2)
    assert cb.input_ids.shape[2] == 12  # longest row
    assert cb.total_tokens == sum(len(r) for r in rows)
    # mask marks exactly the real tokens
    b, j = 0, 0
    assert cb.row_mask[b, j, : len(rows[0])].all()
    assert not cb.row_mask[b, j, len(rows[0]) :].any()


def test_concat_size():
    rows = [np.arange(50), np.arange(30)]
    cb = prepare_calibration(rows, batch_size=4, concat_size=16, sort=None)
    assert cb.input_ids.shape[2] == 16
    assert cb.total_tokens == (80 // 16) * 16


def test_length_sort_desc():
    rows = [np.ones(3), np.ones(10), np.ones(6)]
    cb = prepare_calibration(rows, batch_size=3, sort="desc")
    lens = cb.row_mask[0].sum(axis=1)
    assert list(lens) == sorted(lens, reverse=True)


def test_max_length_truncation():
    rows = [np.arange(100)]
    cb = prepare_calibration(rows, batch_size=1, max_length=32, sort=None)
    assert cb.input_ids.shape[2] == 32
    assert cb.total_tokens == 32


def test_pretokenized_dicts():
    cb = prepare_calibration(
        [{"input_ids": [1, 2, 3]}, {"input_ids": np.array([[4, 5]])}],
        batch_size=2, sort=None,
    )
    assert cb.total_tokens == 5
