"""Value-level goldens for the evaluation metrics.

HD95 (passion_tpu.metrics) re-implements medpy's `hd95` on scipy distance
transforms (reference utils/predict.py:23-76 uses medpy, which is not a
dependency here). These tests pin the numbers: a brute-force independent
oracle (explicit 6-neighbor border extraction + pairwise distances), two
closed-form cases, and the reference's empty-mask / ET-postpro conventions.
"""

import numpy as np
import pytest

from passion_tpu.metrics import (cal_hd95, compute_brats_hd95, dice_class4,
                                 hd95)


def _border_bruteforce(mask: np.ndarray) -> np.ndarray:
    """Voxels of `mask` with at least one 6-neighbor outside the mask,
    counting out-of-bounds as outside (binary_erosion border_value=0
    semantics, which is what medpy's __surface_distances uses)."""
    m = np.pad(mask.astype(bool), 1, constant_values=False)
    interior = np.ones_like(m)
    for ax in range(3):
        interior &= np.roll(m, 1, axis=ax) & np.roll(m, -1, axis=ax)
    border = m & ~interior
    return border[1:-1, 1:-1, 1:-1]


def _hd95_bruteforce(result: np.ndarray, reference: np.ndarray) -> float:
    rb = np.argwhere(_border_bruteforce(result)).astype(float)
    fb = np.argwhere(_border_bruteforce(reference)).astype(float)
    d = np.sqrt(((rb[:, None, :] - fb[None, :, :]) ** 2).sum(-1))
    sd1 = d.min(axis=1)  # result border -> reference border
    sd2 = d.min(axis=0)
    return float(np.percentile(np.hstack([sd1, sd2]), 95))


def test_hd95_identical_masks_zero():
    m = np.zeros((12, 12, 12), bool)
    m[3:8, 4:9, 2:7] = True
    assert hd95(m, m) == 0.0


def test_hd95_single_voxels_closed_form():
    """Two single-voxel masks: every border voxel is the voxel itself, both
    directed surface distances equal the euclidean separation."""
    a = np.zeros((10, 10, 10), bool)
    b = np.zeros((10, 10, 10), bool)
    a[2, 2, 2] = True
    b[5, 6, 2] = True  # distance sqrt(3^2 + 4^2) = 5
    assert hd95(a, b) == pytest.approx(5.0)


def test_hd95_shifted_cubes_matches_bruteforce():
    rng = np.random.default_rng(5)
    a = np.zeros((20, 20, 20), bool)
    b = np.zeros((20, 20, 20), bool)
    a[4:10, 5:11, 6:12] = True
    b[7:13, 5:11, 6:12] = True  # shift +3 along x
    assert hd95(a, b) == pytest.approx(_hd95_bruteforce(a, b))

    # irregular random blobs (dilated noise, non-convex borders)
    for _ in range(3):
        x = rng.random((16, 16, 16)) > 0.7
        y = rng.random((16, 16, 16)) > 0.7
        from scipy import ndimage
        x = ndimage.binary_dilation(x, iterations=1)
        y = ndimage.binary_dilation(y, iterations=1)
        if not (x.any() and y.any()):
            continue
        assert hd95(x, y) == pytest.approx(_hd95_bruteforce(x, y))


def test_hd95_empty_mask_conventions():
    """predict.py:23-47: ref empty & pred empty -> 0; one empty -> 1.0."""
    z = np.zeros((8, 8, 8), int)
    o = np.zeros((8, 8, 8), int)
    o[2:4, 2:4, 2:4] = 1
    assert compute_brats_hd95(z, z) == 0.0
    assert compute_brats_hd95(z, o) == 1.0
    assert compute_brats_hd95(o, z) == 1.0


def test_cal_hd95_regions_and_postpro():
    """cal_hd95 composes WT/TC/ET regions; the ET-postpro channel zeroes a
    sub-500-voxel predicted ET (predict.py:49-76 + the 500-voxel rule)."""
    tgt = np.zeros((24, 24, 24), np.uint8)
    out = np.zeros((24, 24, 24), np.uint8)
    tgt[4:10, 4:10, 4:10] = 1      # NCR/NET (216 voxels)
    tgt[12:18, 4:10, 4:10] = 3     # ET ground truth
    out[4:10, 4:10, 4:10] = 1
    out[13:19, 4:10, 4:10] = 3     # predicted ET: 216 voxels (< 500), shift 1

    wt, tc, et, et_post = cal_hd95(out, tgt)
    # WT/TC regions identical except the ET shift
    assert wt == pytest.approx(_hd95_bruteforce(
        out != 0, tgt != 0))
    assert tc == pytest.approx(_hd95_bruteforce(
        (out == 1) | (out == 3), (tgt == 1) | (tgt == 3)))
    assert et == pytest.approx(_hd95_bruteforce(out == 3, tgt == 3))
    # postpro zeroes the small predicted ET -> empty-pred convention 1.0
    assert et_post == 1.0


def test_dice_class4_golden():
    """Hand-computable composite dice: disjoint class cubes, one overlapping
    prediction."""
    tgt = np.zeros((1, 16, 16, 16), np.int32)
    out = np.zeros((1, 16, 16, 16), np.int32)
    tgt[0, 0:4, 0:4, 0:4] = 1       # 64 voxels class 1
    out[0, 0:4, 0:4, 0:2] = 1       # 32 voxels, all inside target
    sep, ev = dice_class4(out, tgt)
    sep, ev = np.asarray(sep), np.asarray(ev)
    assert sep[0, 0] == pytest.approx(2 * 32 / (32 + 64), abs=1e-6)
    assert sep[0, 1] == pytest.approx(1.0, abs=1e-4)  # both empty -> eps/eps
    assert ev[0, 0] == pytest.approx(2 * 32 / (32 + 64), abs=1e-6)  # WT
    assert ev[0, 1] == pytest.approx(2 * 32 / (32 + 64), abs=1e-6)  # TC
    assert ev[0, 3] == pytest.approx(1.0, abs=1e-4)  # empty ET post
