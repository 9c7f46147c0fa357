"""Evaluation: per-mask sliding-window scoring and the 15-combination sweep.

Mirrors `test_dice_hd95_softmax` (utils/predict.py:144-252) and the
end-of-training sweep (train.py:578-607): for each test case, coverage-
averaged sliding-window softmax -> argmax -> Dice (WT/TC/ET + ET-postpro) and
HD95, per-case CSV rows grouped under a mask-name row, running averages via
AverageMeter. CSV schema matches the reference byte-for-byte, including its
merged 'ET HD95ETPro HD95' header cell (train.py:587 string-concatenation
quirk, kept for output fidelity).
"""

from __future__ import annotations

import csv
import logging
import os

import numpy as np

from passion_tpu.masks import MASK_ARRAY, MASK_NAMES
from passion_tpu.metrics import AverageMeter, cal_hd95, dice_class4

CLASS_EVALUATION = ("whole", "core", "enhancing", "enhancing_postpro")
CLASS_SEPARATE = ("ncr_net", "edema", "enhancing")


def _csv_append(csv_name, row):
    if csv_name is None:
        return
    os.makedirs(os.path.dirname(csv_name) or ".", exist_ok=True)
    with open(csv_name, "a+", newline="") as f:
        csv.writer(f).writerow(row)


def test_dice_hd95_softmax(test_loader, infer_volume, params,
                           dataname="BraTS/BRATS2020", feature_mask=None,
                           mask_name=None, csv_name=None):
    """Score one modality combination over the test set.

    Args:
      test_loader: iterable of dicts with 'x' (B, H, W, Z, 4), 'target'
        (B, H, W, Z) int labels, 'name' list.
      infer_volume: SlidingWindowInference instance.
      params: model parameters.
      feature_mask: length-4 bool list; fixed for every case
        (predict.py:174-179).
    """
    vals_dice = AverageMeter()
    vals_hd95 = AverageMeter()
    vals_separate = AverageMeter()
    n_batches = len(test_loader) if hasattr(test_loader, "__len__") else None

    for i, batch in enumerate(test_loader):
        x = np.asarray(batch["x"])
        target = np.asarray(batch["target"])
        names = batch["name"]
        mask = np.asarray(feature_mask, bool)

        preds = np.stack([infer_volume(params, x[b], mask)
                          for b in range(x.shape[0])])
        pred_lab = np.argmax(preds, axis=-1)

        scores_separate, scores_eval = dice_class4(pred_lab, target)
        scores_separate = np.asarray(scores_separate)
        scores_eval = np.asarray(scores_eval)
        # reference computes HD95 on batch element 0 only (predict.py:222);
        # test batch_size is 1, so compute per element here (superset).
        for k, name in enumerate(names):
            scores_hd95 = np.array(cal_hd95(pred_lab[k], target[k]))
            vals_separate.update(scores_separate[k])
            vals_dice.update(scores_eval[k])
            vals_hd95.update(scores_hd95)
            msg = "Subject {}/{}, {}/{}{:>20}, ".format(
                i + 1, n_batches if n_batches is not None else "?",
                k + 1, len(names), name)
            msg += "DSC: " + ", ".join(
                f"{c}: {v:.4f}" for c, v in zip(CLASS_EVALUATION, scores_eval[k]))
            msg += ", HD95: " + ", ".join(
                f"{c}: {v:.4f}" for c, v in zip(CLASS_EVALUATION, scores_hd95))
            logging.info(msg)
            _csv_append(csv_name, [
                scores_eval[k][0], scores_eval[k][1], scores_eval[k][2],
                scores_eval[k][3], scores_hd95[0], scores_hd95[1],
                scores_hd95[2], scores_hd95[3]])

    msg = "Average scores: DSC: " + ", ".join(
        f"{c}: {v:.4f}" for c, v in zip(CLASS_EVALUATION, vals_dice.avg))
    msg += ", HD95: " + ", ".join(
        f"{c}: {v:.4f}" for c, v in zip(CLASS_EVALUATION, vals_hd95.avg))
    logging.info(msg)
    return vals_dice.avg, vals_hd95.avg


def run_test_sweep(test_loader, infer_volume, params, csv_name=None,
                   dataname="BraTS/BRATS2020", masks=None, mask_names=None):
    """The 15-combination evaluation sweep (train.py:578-607, reversed
    order). Returns (avg_dice (4,), avg_hd95 (4,), per_mask dict)."""
    masks = MASK_ARRAY if masks is None else masks
    mask_names = MASK_NAMES if mask_names is None else mask_names
    dice_meter = AverageMeter()
    hd95_meter = AverageMeter()
    per_mask = {}
    # reference header quirk kept verbatim: 'ET HD95' 'ETPro HD95' merge
    _csv_append(csv_name, ["WT Dice", "TC Dice", "ET Dice", "ETPro Dice",
                           "WT HD95", "TC HD95", "ET HD95" "ETPro HD95"])
    for mask, name in zip(masks[::-1], mask_names[::-1]):
        logging.info(name)
        _csv_append(csv_name, [name])
        dice, hd95 = test_dice_hd95_softmax(
            test_loader, infer_volume, params, dataname=dataname,
            feature_mask=list(mask), mask_name=name, csv_name=csv_name)
        per_mask[name] = dict(dice=np.asarray(dice), hd95=np.asarray(hd95))
        dice_meter.update(dice)
        hd95_meter.update(hd95)
    logging.info("Avg Dice scores: %s", dice_meter.avg)
    logging.info("Avg HD95 scores: %s", hd95_meter.avg)
    return dice_meter.avg, hd95_meter.avg, per_mask
