"""BraTS npy datasets (reference code/data/datasets_nii.py), channels-last.

The preprocessed volumes are stored `(H, W, Z, 4)` float32 and segs
`(H, W, Z)` — already channels-last, so no transposes are needed (the
reference transposes to NCHWD for torch; we keep the on-disk layout, which is
also the TPU-native layout).

Every dataset exposes `get(index, rng)` with an explicit
`numpy.random.Generator` so the loader can run items on worker threads with
per-(epoch, index) reproducible randomness — replacing the reference's
process-global RNG + per-worker reseeding (data/data_utils.py:9-13).
"""

from __future__ import annotations

import ast
import os

import numpy as np

from passion_tpu.data import transforms as T
from passion_tpu.masks import MASK_ARRAY, MASK_VALID_ARRAY

MODAL_INDEX = {"flair": [0], "t1ce": [1], "t1": [2], "t2": [3],
               "all": [0, 1, 2, 3]}


def _read_list(path):
    with open(path) as f:
        names = [line.strip() for line in f if line.strip()]
    names.sort()
    return names


def _build_transform(spec):
    if isinstance(spec, str) or spec is None:
        return T.from_string(spec or "")
    return spec  # already a transform object


def _one_hot(y, num_cls):
    return np.eye(num_cls, dtype=np.float32)[y.astype(np.int64)]


class _BratsBase:
    def __init__(self, root, names, transforms, modal="all"):
        self.root = root
        self.names = names
        self.volpaths = [os.path.join(root, "vol", n + "_vol.npy")
                         for n in names]
        self.transform = _build_transform(transforms)
        self.modal_ind = np.array(MODAL_INDEX[modal])

    def __len__(self):
        return len(self.names)

    def _load(self, index):
        x = np.load(self.volpaths[index])  # (H, W, Z, 4) float32
        y = np.load(self.volpaths[index].replace("vol", "seg"))  # (H, W, Z)
        return x[None].astype(np.float32), y[None]


class BratsTrainPDT(_BratsBase):
    """Partially-different training: random mask from all 15 combos per
    access (datasets_nii.py:37-92)."""

    def __init__(self, transforms="", root=None, modal="all", num_cls=4,
                 train_file="train.txt"):
        super().__init__(root, _read_list(os.path.join(root, train_file)),
                         transforms, modal)
        self.num_cls = num_cls

    def get(self, index, rng):
        x, y = self._load(index)
        x, y = self.transform([x, y], rng)
        yo = _one_hot(y[0], self.num_cls)
        x = x[0][..., self.modal_ind]
        mask = MASK_ARRAY[int(rng.integers(0, 15))]
        return dict(x=x, target=yo, mask=mask.copy(), name=self.names[index])


class BratsTrainIDT(_BratsBase):
    """Identically-/drop-different training driven by the imb-MR CSV
    (datasets_nii.py:94-163)."""

    def __init__(self, transforms="", root=None, modal="all", num_cls=4,
                 mask_type="idt", train_file=None):
        import csv as _csv

        with open(train_file) as f:
            rows = list(_csv.DictReader(f))
        names = [r["data_name"] for r in rows]
        super().__init__(root, names, transforms, modal)
        # NOTE: unlike the txt-based datasets we must NOT sort — CSV row
        # order defines the sample<->mask pairing. Rebuild paths in CSV order.
        self.names = names
        self.volpaths = [os.path.join(root, "vol", n + "_vol.npy")
                         for n in names]
        self.mask_ids = [int(r["mask_id"]) for r in rows]
        self.pos_mask_ids = [ast.literal_eval(r["pos_mask_ids"]) for r in rows]
        self.sample_masks = [ast.literal_eval(r["mask"]) for r in rows]
        self.num_cls = num_cls
        self.mask_type = mask_type

    def modal_counts(self):
        """Per-modality present counts over the CSV (train.py:163-168)."""
        return np.array(self.sample_masks, dtype=np.int64).sum(axis=0)

    def get(self, index, rng):
        if self.mask_type == "idt":
            mask_idx = self.mask_ids[index]
        elif self.mask_type == "idt_drop":
            choices = self.pos_mask_ids[index]
            mask_idx = int(choices[int(rng.integers(0, len(choices)))])
        elif self.mask_type == "pdt":
            mask_idx = int(rng.integers(0, 15))
        else:
            raise ValueError(f"bad mask_type {self.mask_type!r}")
        x, y = self._load(index)
        x, y = self.transform([x, y], rng)
        yo = _one_hot(y[0], self.num_cls)
        x = x[0][..., self.modal_ind]
        return dict(x=x, target=yo, mask=MASK_ARRAY[mask_idx].copy(),
                    name=self.names[index])


class BratsTest(_BratsBase):
    """Full uncropped volumes + integer labels (datasets_nii.py:165-208)."""

    def __init__(self, transforms="", root=None, modal="all",
                 test_file="test.txt"):
        super().__init__(root, _read_list(os.path.join(root, test_file)),
                         transforms, modal)

    def get(self, index, rng=None):
        x, y = self._load(index)
        y = y.astype(np.uint8)
        rng = rng or np.random.default_rng(0)
        x, y = self.transform([x, y], rng)
        x = x[0][..., self.modal_ind]
        return dict(x=x, target=y[0], name=self.names[index])


class BratsVal(_BratsBase):
    """Validation with the fixed 4-mask subset (datasets_nii.py:211-266)."""

    def __init__(self, transforms="", root=None, modal="all", num_cls=4,
                 train_file="val.txt"):
        super().__init__(root, _read_list(os.path.join(root, train_file)),
                         transforms, modal)
        self.num_cls = num_cls

    def get(self, index, rng):
        x, y = self._load(index)
        x, y = self.transform([x, y], rng)
        yo = _one_hot(y[0], self.num_cls)
        x = x[0][..., self.modal_ind]
        mask = MASK_VALID_ARRAY[int(rng.integers(0, 4))]
        return dict(x=x, target=yo, mask=mask.copy(), name=self.names[index])
