"""End-to-end training smoke: synthetic data -> PASSION fit -> checkpoint ->
resume -> eval engine on the trained params."""

import glob
import os

import jax
import numpy as np
import pytest

from passion_tpu.config import TrainConfig
from passion_tpu.data.datasets import BratsTrainIDT
from passion_tpu.data.loader import PrefetchLoader
from passion_tpu.data.synth import make_synthetic_dataset
from passion_tpu.engine.schedule import lr_at_epoch
from passion_tpu.engine.train_loop import fit, update_imb_beta
from passion_tpu.models.rfnet import RFNet

PATCH = 16


class ScalarWriter:
    """JSONL scalar writer (duck-typed like TensorBoardWriter) — a test
    oracle that keeps the fit() scalar-channel assertions cheap to parse."""

    def __init__(self, savepath):
        import json
        self._json = json
        self.path = os.path.join(savepath, "summary", "scalars.jsonl")
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        self._f = open(self.path, "a")

    def add_scalar(self, tag, value, global_step):
        self._f.write(self._json.dumps(
            {"step": int(global_step), "tag": tag, "value": float(value)}) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


@pytest.fixture(scope="module")
def train_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_train")
    make_synthetic_dataset(str(root), n_cases=4, shape=(24, 24, 20), seed=11)
    ds = BratsTrainIDT(
        transforms=f"Compose([RandCrop3D(({PATCH},{PATCH},{PATCH})), "
                   "NumpyType((np.float32, np.int64)),])",
        root=str(root), mask_type="idt",
        train_file=os.path.join(str(root), "imb_split.csv"))
    return root, ds


def _cfg(tmp_path, **kw):
    base = dict(model="rfnet", batch_size=2, lr=1e-3, num_epochs=2,
                temp=4.0, region_fusion_start_epoch=1, seed=3,
                mask_type="idt", use_passion=True,
                savepath=str(tmp_path / "out"), patch_size=PATCH,
                iters_per_epoch=2)
    base.update(kw)
    return TrainConfig(**base)


@pytest.mark.slow
def test_fit_passion_smoke_and_resume(train_setup, tmp_path):
    root, ds = train_setup
    loader = PrefetchLoader(ds, batch_size=2, shuffle=True, seed=3,
                            num_threads=2)
    cfg = _cfg(tmp_path)
    model = RFNet(num_cls=4, basic_dims=4, mask_type="idt")
    params, opt_state, history = fit(model, loader, cfg,
                                     modal_num=ds.modal_counts())
    assert len(history) == 2
    for h in history:
        assert np.isfinite(h["loss"]), h
    # epoch 0 is warmup: only sep loss in total
    assert history[0]["fuse_loss"] >= 0
    ckpts = glob.glob(os.path.join(cfg.savepath, "*.msgpack"))
    assert any("model_last" in c for c in ckpts)

    # resume from last: continues at epoch 2 == num_epochs -> no new epochs
    cfg2 = _cfg(tmp_path, num_epochs=3,
                resume=os.path.join(cfg.savepath, "model_last.msgpack"))
    params2, _, hist2 = fit(model, loader, cfg2, modal_num=ds.modal_counts())
    assert len(hist2) == 1 and hist2[0]["epoch"] == 2


@pytest.mark.slow
def test_fit_no_passion(train_setup, tmp_path):
    root, ds = train_setup
    loader = PrefetchLoader(ds, batch_size=2, shuffle=True, seed=3,
                            num_threads=2)
    cfg = _cfg(tmp_path, use_passion=False, num_epochs=1,
               region_fusion_start_epoch=0)
    model = RFNet(num_cls=4, basic_dims=4, mask_type="idt")
    _, _, history = fit(model, loader, cfg, modal_num=ds.modal_counts())
    assert np.isfinite(history[0]["loss"])
    assert history[0]["kl_loss"] == 0.0


@pytest.mark.slow
def test_fit_use_valid_scores_and_model_best(train_setup, tmp_path):
    """Working --use_valid path (reference train.py:468-544, disabled there):
    per-epoch 15-mask validation scores on all three channels + the exact
    model_best selection rule (first epoch seeds best WITHOUT saving)."""
    import json

    from passion_tpu.data.datasets import BratsVal
    from passion_tpu.masks import MASK_NAMES

    root, ds = train_setup
    loader = PrefetchLoader(ds, batch_size=2, shuffle=True, seed=3,
                            num_threads=2)
    val_ds = BratsVal(
        transforms=f"Compose([RandCrop3D(({PATCH},{PATCH},{PATCH})), "
                   "NumpyType((np.float32, np.int64)),])",
        root=str(root), train_file="val.txt")
    val_loader = PrefetchLoader(val_ds, batch_size=1, shuffle=False,
                                num_threads=1)
    cfg = _cfg(tmp_path, use_valid=True, num_epochs=3)
    model = RFNet(num_cls=4, basic_dims=4, mask_type="idt")
    writer = ScalarWriter(cfg.savepath)
    fit(model, loader, cfg, modal_num=ds.modal_counts(), writer=writer,
        val_loader=val_loader)
    writer.close()

    with open(os.path.join(cfg.savepath, "summary", "scalars.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    scores = [r["value"] for r in rows if r["tag"] == "score_average"]
    assert len(scores) == 3 and np.isfinite(scores).all()
    assert set(MASK_NAMES) <= {r["tag"] for r in rows}  # per-mask scalars
    # model_best saved iff a later epoch beat the running best
    should_save = scores[1] > scores[0] or scores[2] > max(scores[:2])
    assert os.path.exists(
        os.path.join(cfg.savepath, "model_best.msgpack")) == should_save


def test_lr_schedule_matches_reference_poly():
    # reference: round(lr * (1 - e/n)^0.9, 8) (lr_scheduler.py:16-17)
    assert lr_at_epoch(0, 2e-4, 300) == 2e-4
    assert lr_at_epoch(150, 2e-4, 300) == round(2e-4 * 0.5 ** 0.9, 8)
    assert lr_at_epoch(299, 2e-4, 300) == round(2e-4 * (1 - 299 / 300) ** 0.9, 8)


def test_update_imb_beta_reference_semantics():
    beta = np.ones(4, np.float32)
    dist_m = np.array([0.1, 0.2, 0.3, 0.4])
    # during warmup: unchanged
    b, eta, rp = update_imb_beta(beta, 0.01, dist_m, epoch=0, warmup_epochs=1)
    np.testing.assert_array_equal(b, beta)
    # after warmup at epoch 100: eta bumps 1.5x, beta renormalized to ||b||=2
    b, eta, rp = update_imb_beta(beta, 0.01, dist_m, epoch=100, warmup_epochs=0)
    assert eta == 0.015
    np.testing.assert_allclose(np.linalg.norm(b), 2.0, rtol=1e-6)
    # under-served modality (low dist? no: HIGH rp -> beta decreases)
    # rp_epoch = (avg - m)/avg: modality with small dist has positive rp
    assert rp[0] > 0 > rp[3]
    assert b[0] < b[3]  # beta shifts weight toward high-dist modalities
