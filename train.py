#!/usr/bin/env python
"""PASSION-TPU training CLI — the reference's `python train.py` surface
(code/train.py + code/options.py).

Example (canonical config, scripts/train.sh:19-24):
  python train.py --model mmformer --use_passion --mask_type idt \
      --dataroot DATA --imbmrpath BraTS/brats_split/Brats2020_imb_split_mr2468.csv \
      --num_epochs 300 --lr 2e-4 --temp 4 --savepath outputs/run

Trains with the in-graph PASSION step, checkpoints every epoch, and finishes
with the 15-mask-combination evaluation sweep (train.py:578-607).
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
    setup(cfg, "training")
    set_seed(cfg.seed)

    import jax

    from passion_tpu.data.datasets import BratsTest, BratsTrainIDT, BratsVal
    from passion_tpu.data.loader import PrefetchLoader
    from passion_tpu.engine.evaluator import run_test_sweep
    from passion_tpu.engine.sliding_window import make_engine
    from passion_tpu.engine.tb_writer import TensorBoardWriter
    from passion_tpu.engine.train_loop import fit
    from passion_tpu.models import get_model

    logging.info(str(cfg))
    if cfg.dataname not in ("BraTS/BRATS2021", "BraTS/BRATS2020",
                            "BraTS/BRATS2018"):
        raise SystemExit("dataset is error")

    model = get_model(cfg.model, num_cls=cfg.num_cls,
                      mask_type=cfg.mask_type, patch_size=cfg.patch_size,
                      **cfg.model_kwargs)

    # Data-parallel mesh (replaces the reference's nn.DataParallel,
    # train.py:90): batch axis sharded, params replicated, XLA emits the
    # gradient all-reduce over ICI.
    mesh = None
    if cfg.data_parallel:
        from passion_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(None if cfg.data_parallel < 0 else cfg.data_parallel)
        logging.info("data-parallel mesh over %d device(s): %s", mesh.size,
                     [str(d) for d in mesh.devices.flat])

    if cfg.mask_type not in ("pdt", "idt", "idt_drop"):
        raise SystemExit("training setting is error")
    train_set = BratsTrainIDT(
        transforms=cfg.train_transforms, root=cfg.dataset_path,
        num_cls=cfg.num_cls, mask_type=cfg.mask_type,
        train_file=cfg.imbmr_path)
    train_loader = PrefetchLoader(train_set, batch_size=cfg.batch_size,
                                  shuffle=True, seed=cfg.seed,
                                  num_threads=cfg.num_workers)
    modal_num = train_set.modal_counts()

    # Working --use_valid path (the reference's is commented out,
    # train.py:135-141,468-544): per-epoch 15-mask validation scoring with
    # model_best checkpointing. Val set = val.txt with train transforms
    # (train.py:122).
    val_loader = None
    if cfg.use_valid:
        val_set = BratsVal(transforms=cfg.train_transforms,
                           root=cfg.dataset_path, num_cls=cfg.num_cls,
                           train_file="val.txt")
        val_loader = PrefetchLoader(val_set, batch_size=cfg.batch_size,
                                    shuffle=True, seed=cfg.seed,
                                    num_threads=cfg.num_workers)

    # TensorBoard scalar channel, same location + tag set as the reference
    # SummaryWriter (train.py:39,342-354)
    writer = TensorBoardWriter(cfg.savepath)
    params, _, _ = fit(model, train_loader, cfg, modal_num=modal_num,
                       writer=writer, val_loader=val_loader, mesh=mesh)

    # final 15-combination test sweep (train.py:578-607)
    test_set = BratsTest(transforms=cfg.test_transforms,
                         root=cfg.dataset_path, test_file="test.txt")
    test_loader = PrefetchLoader(test_set, batch_size=1, shuffle=False,
                                 num_threads=1)
    engine = make_engine(model, cfg.num_cls, cfg.patch_size,
                         window_batch=cfg.window_batch, mesh=mesh)
    csv_name = os.path.join(cfg.savepath, f"{cfg.model}.csv")
    logging.info("###########test last epoch model###########")
    avg_dice, avg_hd95, _ = run_test_sweep(
        test_loader, engine, params, csv_name=csv_name, dataname=cfg.dataname)
    logging.info("Avg Dice scores: %s", avg_dice)
    logging.info("Avg HD95 scores: %s", avg_hd95)


if __name__ == "__main__":
    main()
