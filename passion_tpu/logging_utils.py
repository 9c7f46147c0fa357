"""Logging bootstrap + seeding (reference code/utils/parser.py:63-105)."""

from __future__ import annotations

import logging
import os
import random
import sys

import numpy as np


def setup(cfg, mode: str = "training") -> None:
    """File + console logging to `{savepath}/{mask_type}_{mode}.txt`
    (parser.py:90-105)."""
    os.makedirs(cfg.savepath, exist_ok=True)
    log_file = os.path.join(cfg.savepath, f"{cfg.mask_type}_{mode}.txt")
    root = logging.getLogger()
    root.setLevel(logging.INFO)
    for h in list(root.handlers):
        root.removeHandler(h)
    fmt = logging.Formatter("%(asctime)s %(message)s", "%m-%d %H:%M:%S")
    fh = logging.FileHandler(log_file)
    fh.setFormatter(fmt)
    root.addHandler(fh)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    root.addHandler(sh)


def set_seed(seed: int) -> None:
    """Seed host RNGs (parser.py:63-68). Device-side randomness is explicit
    jax.random key threading — no global device seed exists or is needed."""
    random.seed(seed)
    np.random.seed(seed)


def record_loss(writer, masks, loss_list, loss_names, step, mask_table,
                mask_names, p_types) -> None:
    """Per-sample, per-mask-combination scalar logging
    (utils/lr_scheduler.py:63-69 — dead code in the reference; its live loop
    logs epoch aggregates instead, train.py:342-354).

    For each sample ``i`` whose modality mask ``masks[i]`` equals row ``j``
    of ``mask_table``, writes ``{p_types[i]}_{mask_names[j]}_{name}`` for
    every (loss array, name) pair — loss arrays are indexed ``[k][i]``
    exactly like the reference's ``loss_list[k][i].item()``.

    ``writer`` needs only ``add_scalar(tag, value, global_step)`` — both our
    TFRecord :class:`passion_tpu.engine.tb_writer.TensorBoardWriter` and
    torch's SummaryWriter qualify.
    """
    masks = np.asarray(masks).astype(bool)
    table = np.asarray(mask_table).astype(bool)
    for i in range(masks.shape[0]):
        for j in range(table.shape[0]):
            if (masks[i] == table[j]).all():
                for k, name in enumerate(loss_names):
                    writer.add_scalar(
                        f"{p_types[i]}_{mask_names[j]}_{name}",
                        float(np.asarray(loss_list[k][i])), step)
