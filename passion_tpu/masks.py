"""Modality-combination mask tables.

Four MRI modalities in fixed index order FLAIR, T1ce, T1, T2. A boolean
length-4 mask selects which modalities are present; there are 15 non-empty
combinations, enumerated in the same canonical order as the reference
(code/train.py:42-50, code/data/datasets_nii.py:27-34) so that `mask_id`
columns in the shipped imbalanced-missing-rate CSVs resolve identically.
"""

from __future__ import annotations

import numpy as np

MODALITIES = ("flair", "t1ce", "t1", "t2")
NUM_MODALS = 4

# 15 non-empty modality combinations, canonical order (train.py:42-45).
MASK_ARRAY = np.array(
    [
        [False, False, False, True],
        [False, True, False, False],
        [False, False, True, False],
        [True, False, False, False],
        [False, True, False, True],
        [False, True, True, False],
        [True, False, True, False],
        [False, False, True, True],
        [True, False, False, True],
        [True, True, False, False],
        [True, True, True, False],
        [True, False, True, True],
        [True, True, False, True],
        [False, True, True, True],
        [True, True, True, True],
    ],
    dtype=bool,
)

# Human-readable names aligned with MASK_ARRAY rows (train.py:47-50).
MASK_NAMES = (
    "t2", "t1c", "t1", "flair",
    "t1cet2", "t1cet1", "flairt1", "t1t2", "flairt2", "flairt1ce",
    "flairt1cet1", "flairt1t2", "flairt1cet2", "t1cet1t2",
    "flairt1cet1t2",
)

# Fixed validation subset (datasets_nii.py:31-34); kept for parity although
# the reference's validation loop is disabled.
MASK_VALID_ARRAY = np.array(
    [
        [False, False, True, False],
        [False, True, True, False],
        [True, True, False, True],
        [True, True, True, True],
    ],
    dtype=bool,
)

# Single-modality masks used for the PASSION unimodal paths
# (rfnet.py:202-205 and equivalents).
SINGLE_MODALITY_MASKS = np.eye(NUM_MODALS, dtype=bool)

ALL_PRESENT = np.array([True, True, True, True], dtype=bool)


def mask_id_of(mask) -> int:
    """Return the canonical mask_id (row index in MASK_ARRAY) of a mask."""
    mask = np.asarray(mask, dtype=bool)
    hits = np.nonzero((MASK_ARRAY == mask[None, :]).all(axis=1))[0]
    if hits.size != 1:
        raise ValueError(f"not a valid non-empty modality mask: {mask}")
    return int(hits[0])


def sub_combination_ids(mask) -> list[int]:
    """All mask_ids whose present set is a non-empty subset of `mask`.

    Mirrors the `pos_mask_ids` column of the imb-MR CSVs
    (preprocessing/generate_imb_mr.py:220-279): the legal combinations a
    sample may be dropped to under `idt_drop` training.
    """
    mask = np.asarray(mask, dtype=bool)
    ids = []
    for i, row in enumerate(MASK_ARRAY):
        if not np.any(row & ~mask):
            ids.append(i)
    return ids
