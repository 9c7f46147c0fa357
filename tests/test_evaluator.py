"""Evaluation sweep on a synthetic dataset with a tiny RFNet."""

import csv
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from passion_tpu.data.datasets import BratsTest
from passion_tpu.data.loader import PrefetchLoader
from passion_tpu.data.synth import make_synthetic_dataset
from passion_tpu.engine.evaluator import run_test_sweep
from passion_tpu.engine.evaluator import test_dice_hd95_softmax as eval_one_mask
from passion_tpu.engine.sliding_window import SlidingWindowInference
from passion_tpu.masks import MASK_ARRAY, MASK_NAMES
from passion_tpu.models.rfnet import RFNet

PATCH = 16


@pytest.fixture(scope="module")
def eval_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_eval")
    make_synthetic_dataset(str(root), n_cases=3, shape=(24, 24, 20), seed=5)
    ds = BratsTest(transforms="Compose([NumpyType((np.float32, np.int64)),])",
                   root=str(root))
    loader = PrefetchLoader(ds, batch_size=1, shuffle=False, num_threads=1)
    model = RFNet(num_cls=4, basic_dims=4, mask_type="idt")
    from passion_tpu.models import init_params_host
    params = init_params_host(model, seed=0, patch_size=PATCH)
    engine = SlidingWindowInference(model.apply, 4, PATCH, window_batch=4)
    return loader, engine, params, str(root)


def test_single_mask_eval(eval_setup, tmp_path):
    loader, engine, params, _ = eval_setup
    csv_name = str(tmp_path / "scores.csv")
    dice, hd95 = eval_one_mask(
        loader, engine, params, feature_mask=list(MASK_ARRAY[14]),
        mask_name="flairt1cet1t2", csv_name=csv_name)
    assert dice.shape == (4,) and hd95.shape == (4,)
    assert np.isfinite(dice).all() and np.isfinite(hd95).all()
    assert (dice >= 0).all() and (dice <= 1).all()
    with open(csv_name) as f:
        rows = list(csv.reader(f))
    assert len(rows) == 1  # one test case, one row of 8 scores
    assert len(rows[0]) == 8


def test_full_sweep_csv_schema(eval_setup, tmp_path):
    loader, engine, params, _ = eval_setup
    csv_name = str(tmp_path / "sweep.csv")
    # restrict to 2 masks to keep runtime sane; sweep logic is identical
    avg_dice, avg_hd95, per_mask = run_test_sweep(
        loader, engine, params, csv_name=csv_name,
        masks=MASK_ARRAY[13:], mask_names=MASK_NAMES[13:])
    assert set(per_mask) == {"t1cet1t2", "flairt1cet1t2"}
    with open(csv_name) as f:
        rows = list(csv.reader(f))
    # header + per mask: name row + 1 case row
    assert rows[0][:4] == ["WT Dice", "TC Dice", "ET Dice", "ETPro Dice"]
    assert rows[0][-1] == "ET HD95ETPro HD95"  # reference header quirk
    assert rows[1] == ["flairt1cet1t2"]  # reversed order: full mask first
    assert len(rows) == 1 + 2 * 2
    assert np.isfinite(avg_dice).all() and np.isfinite(avg_hd95).all()


@pytest.mark.slow
def test_sweep_engine_path_matches_plain_engine(eval_setup, tmp_path):
    """run_test_sweep through the feature-reusing SlidingWindowSweep must
    score identically to the plain per-mask engine."""
    from passion_tpu.engine.sliding_window import SlidingWindowSweep
    from passion_tpu.models.rfnet import RFNet

    loader, engine, params, _ = eval_setup
    model = RFNet(num_cls=4, basic_dims=4, mask_type="idt")
    sweep_engine = SlidingWindowSweep(model, 4, PATCH, window_batch=4)
    ref = run_test_sweep(loader, engine, params,
                         masks=MASK_ARRAY[13:], mask_names=MASK_NAMES[13:])
    got = run_test_sweep(loader, sweep_engine, params,
                         masks=MASK_ARRAY[13:], mask_names=MASK_NAMES[13:])
    np.testing.assert_allclose(got[0], ref[0], atol=1e-4)  # dice (bf16 path)
    np.testing.assert_allclose(got[1], ref[1], atol=0.5)   # hd95
