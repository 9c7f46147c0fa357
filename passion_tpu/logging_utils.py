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
