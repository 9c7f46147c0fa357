"""End-to-end CLI smoke: the public `python train.py` / `python eval.py`
surfaces (reference scripts/train.sh:19-24 + the intended eval.py surface,
reference eval.py:30-47) driven in-process on a synthetic dataset.

Covers what the function-level tests don't: argparse config parsing, the
driver wiring (config -> data -> fit -> final 15-mask sweep,
train.py:578-607), checkpoint retention, and all three observability
channels (log file parser.py:90-105, TensorBoard events train.py:39,
per-case CSV train.py:582-594) from one command.
"""

import csv
import glob
import os

import pytest

import eval as eval_cli
import train as train_cli
from passion_tpu.data.synth import make_synthetic_dataset


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_cli")
    make_synthetic_dataset(str(root), n_cases=3, shape=(24, 24, 20), seed=5)
    return str(root)


def _common_args(root, savepath):
    return ["--model", "rfnet", "--basic_dims", "4", "--patch_size", "16",
            "--window_batch", "4", "--mask_type", "idt",
            "--dataroot", root, "--datapath", ".",
            "--imbmrpath", "imb_split.csv",
            "--savepath", savepath, "--num_workers", "2", "--seed", "3"]


@pytest.mark.slow
def test_train_then_eval_cli_end_to_end(synth_root, tmp_path):
    out = str(tmp_path / "run")
    train_cli.main(_common_args(synth_root, out) + [
        "--use_passion", "--num_epochs", "2", "--iters_per_epoch", "2",
        "--batch_size", "2", "--lr", "1e-3",
        "--region_fusion_start_epoch", "1"])

    # checkpoint channel: reference retention policy (train.py:357-364)
    assert os.path.exists(os.path.join(out, "model_last.msgpack"))
    # logging channel: {mask_type}_{mode}.txt (parser.py:90-105)
    assert os.path.getsize(os.path.join(out, "idt_training.txt")) > 0
    # TensorBoard channel (train.py:39)
    assert glob.glob(os.path.join(out, "summary", "events.out.tfevents.*"))
    # CSV channel: full 15-mask sweep, header quirk included (train.py:587)
    with open(os.path.join(out, "rfnet.csv")) as f:
        rows = list(csv.reader(f))
    assert rows[0][-1] == "ET HD95ETPro HD95"
    assert ["flairt1cet1t2"] in rows  # full-modality block present
    # header + 15 masks x (name row + 1 test-case row)
    assert len(rows) == 1 + 15 * 2

    # standalone eval surface on the trained checkpoint
    out2 = str(tmp_path / "eval")
    eval_cli.main(_common_args(synth_root, out2) + [
        "--resume", os.path.join(out, "model_last.msgpack")])
    with open(os.path.join(out2, "rfnet.csv")) as f:
        rows2 = list(csv.reader(f))
    assert len(rows2) == 1 + 15 * 2
    assert os.path.getsize(os.path.join(out2, "idt_eval.txt")) > 0


def test_eval_cli_requires_resume(synth_root, tmp_path):
    with pytest.raises(SystemExit):
        eval_cli.main(_common_args(synth_root, str(tmp_path / "e")))
