#!/usr/bin/env python
"""Standalone evaluation CLI — the reference's intended `python eval.py`
surface (code/eval.py; broken as shipped — imports nonexistent *_passion
modules, eval.py:20,116-121 — rebuilt working here).

Loads a checkpoint and runs the 15-modality-combination sliding-window sweep
with Dice WT/TC/ET(+postpro) and HD95, per-case CSV rows.

  python eval.py --model mmformer --resume outputs/run/model_last.msgpack \
      --dataroot DATA --savepath outputs/eval
"""

from __future__ import annotations

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    from passion_tpu.config import parse_config
    from passion_tpu.logging_utils import set_seed, setup

    cfg = parse_config(argv)
    setup(cfg, "eval")
    set_seed(cfg.seed)

    import jax

    from passion_tpu.data.datasets import BratsTest
    from passion_tpu.data.loader import PrefetchLoader
    from passion_tpu.engine import checkpoint as ckpt
    from passion_tpu.engine.evaluator import run_test_sweep
    from passion_tpu.engine.sliding_window import make_engine
    from passion_tpu.models import get_model, init_params

    logging.info(str(cfg))
    if not cfg.resume:  # fail BEFORE the expensive model build/init
        raise SystemExit("--resume checkpoint path is required")
    model = get_model(cfg.model, num_cls=cfg.num_cls,
                      mask_type=cfg.mask_type, patch_size=cfg.patch_size,
                      **cfg.model_kwargs)
    params = init_params(model, jax.random.PRNGKey(cfg.seed),
                         patch_size=cfg.patch_size)
    params, epoch = ckpt.load_params(cfg.resume, params)
    logging.info("loaded %s (epoch %s)", cfg.resume, epoch)

    test_set = BratsTest(transforms=cfg.test_transforms,
                         root=cfg.dataset_path, test_file="test.txt")
    test_loader = PrefetchLoader(test_set, batch_size=1, shuffle=False,
                                 num_threads=1)
    mesh = None
    if cfg.data_parallel:
        from passion_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(None if cfg.data_parallel < 0 else cfg.data_parallel)
        logging.info("data-parallel mesh over %d device(s)", mesh.size)
    engine = make_engine(model, cfg.num_cls, cfg.patch_size,
                         window_batch=cfg.window_batch, mesh=mesh)
    csv_name = os.path.join(cfg.savepath, f"{cfg.model}.csv")
    avg_dice, avg_hd95, _ = run_test_sweep(
        test_loader, engine, params, csv_name=csv_name, dataname=cfg.dataname)
    logging.info("Avg Dice scores: %s", avg_dice)
    logging.info("Avg HD95 scores: %s", avg_hd95)


if __name__ == "__main__":
    main()
