"""Evaluation metrics: BraTS composite-region Dice (device) and HD95 (host).

Dice mirrors `softmax_output_dice_class4` (code/utils/predict.py:78-124):
per-class NCR/NET, ED, ET dice plus WT/TC/ET composite regions and the
ET-postprocessing rule (predicted ET zeroed when < 500 voxels).

HD95 mirrors `cal_hd95`/`compute_BraTS_HD95` (predict.py:23-76) including
the 0 / 1.0 conventions for empty masks, re-implemented on scipy distance
transforms (medpy is not a dependency). HD95 is per-case host-side
postprocessing — not a hot path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy import ndimage

EPS = 1e-8
ET_POSTPRO_MIN_VOXELS = 500


def dice_class4(output: jnp.ndarray, target: jnp.ndarray):
    """BraTS 4-class dice scores from integer label volumes.

    Args:
      output, target: (B, H, W, Z) integer labels in {0,1,2,3}.

    Returns:
      dice_separate (B, 3): [NCR/NET, ED, ET]
      dice_evaluate (B, 4): [WT, TC, ET, ET-postpro]

    Note: the reference gates the ET-postpro rule on the whole batch's ET
    voxel count (predict.py:100); we gate per sample, identical for the
    reference's test batch_size=1.
    """
    axes = (1, 2, 3)

    def _dice(o, t):
        inter = jnp.sum(2.0 * (o * t), axis=axes) + EPS
        denom = jnp.sum(o, axis=axes) + jnp.sum(t, axis=axes) + EPS
        return inter / denom

    o1 = (output == 1).astype(jnp.float32)
    t1 = (target == 1).astype(jnp.float32)
    o2 = (output == 2).astype(jnp.float32)
    t2 = (target == 2).astype(jnp.float32)
    o3 = (output == 3).astype(jnp.float32)
    t3 = (target == 3).astype(jnp.float32)

    ncr_net = _dice(o1, t1)
    edema = _dice(o2, t2)
    enhancing = _dice(o3, t3)

    et_voxels = jnp.sum(o3, axis=axes)
    o4 = jnp.where((et_voxels < ET_POSTPRO_MIN_VOXELS)[:, None, None, None],
                   jnp.zeros_like(o3), o3)
    enhancing_post = _dice(o4, t3)

    whole = _dice(o1 + o2 + o3, t1 + t2 + t3)
    core = _dice(o1 + o3, t1 + t3)

    dice_separate = jnp.stack([ncr_net, edema, enhancing], axis=1)
    dice_evaluate = jnp.stack([whole, core, enhancing, enhancing_post], axis=1)
    return dice_separate, dice_evaluate


# ---------------------------------------------------------------------------
# HD95 (host, numpy/scipy)
# ---------------------------------------------------------------------------

def _surface_distances(result: np.ndarray, reference: np.ndarray,
                       spacing=(1.0, 1.0, 1.0)) -> np.ndarray:
    """Distances from `result` border voxels to `reference` border."""
    footprint = ndimage.generate_binary_structure(result.ndim, 1)
    result_border = result ^ ndimage.binary_erosion(result, structure=footprint,
                                                    iterations=1)
    reference_border = reference ^ ndimage.binary_erosion(
        reference, structure=footprint, iterations=1)
    dt = ndimage.distance_transform_edt(~reference_border, sampling=spacing)
    return dt[result_border]


def hd95(result: np.ndarray, reference: np.ndarray,
         spacing=(1.0, 1.0, 1.0)) -> float:
    """95th-percentile symmetric Hausdorff distance of binary volumes."""
    sd1 = _surface_distances(result, reference, spacing)
    sd2 = _surface_distances(reference, result, spacing)
    return float(np.percentile(np.hstack((sd1, sd2)), 95))


def compute_brats_hd95(ref: np.ndarray, pred: np.ndarray) -> float:
    """Empty-mask conventions of predict.py:23-47 (spacing (1,1,1))."""
    num_ref = int(np.sum(ref))
    num_pred = int(np.sum(pred))
    if num_ref == 0:
        return 0.0 if num_pred == 0 else 1.0
    if num_pred == 0:
        return 1.0
    return hd95(pred.astype(bool), ref.astype(bool))


def cal_hd95(output: np.ndarray, target: np.ndarray):
    """(WT, TC, ET, ET-postpro) HD95 from integer label volumes."""
    out = np.asarray(output)
    tgt = np.asarray(target)

    hd_whole = compute_brats_hd95((tgt != 0).astype(int), (out != 0).astype(int))
    hd_core = compute_brats_hd95(((tgt == 1) | (tgt == 3)).astype(int),
                                 ((out == 1) | (out == 3)).astype(int))
    pred_et = (out == 3).astype(int)
    hd_enh = compute_brats_hd95((tgt == 3).astype(int), pred_et)
    pred_et_post = pred_et * 0 if pred_et.sum() < ET_POSTPRO_MIN_VOXELS else pred_et
    hd_enh_post = compute_brats_hd95((tgt == 3).astype(int), pred_et_post)
    return (hd_whole, hd_core, hd_enh, hd_enh_post)


class AverageMeter:
    """Running average (predict.py:127-142)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0
        self.avg = 0
        self.sum = 0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum = self.sum + val * n
        self.count += n
        self.avg = self.sum / self.count
