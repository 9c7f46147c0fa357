"""End-to-end output-fidelity parity: the reference's OWN sliding-window
evaluator vs ours, CSV row for CSV row (VERDICT r2 item 8).

The reference's `utils/predict.py:test_dice_hd95_softmax` (reference
predict.py:144-252) is executed directly as the oracle — on CPU, at a
reduced `patch_size` (a module global, predict.py:21), with `.cuda()`
no-op'd — against a briefly-TRAINED torch RFNet. The same weights are
transplanted into our flax RFNet and the same volume goes through our
`passion_tpu.engine.evaluator.test_dice_hd95_softmax` +
`SlidingWindowInference` (fp32 parity mode). The per-case CSV rows (Dice
WT/TC/ET/ETpp + HD95 x4) must agree to ~1e-3 for several modality masks —
pinning the full pipeline: window protocol (50%-overlap + tail flush),
coverage-weighted softmax averaging, argmax, composite-region Dice, the
500-voxel ET postprocessing rule, HD95 conventions, and the CSV schema.

Deviations handled:
  * `medpy`/`nibabel` are not installed here; the reference module gets a
    stub `medpy.metric.hd95` backed by OUR HD95 (itself value-golden-tested
    against an independent brute-force oracle in tests/test_metrics.py) and
    an empty `nibabel` module. HD95 column parity therefore certifies the
    *callers* agree (binarization, empty-mask 0/1 conventions, column
    order), with the metric core pinned by its own goldens.
"""

import csv
import os
import sys
import types

import numpy as np
import pytest

REF_CODE = "/root/reference/code"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF_CODE),
                       reason="reference code not available"),
]

PATCH = 16
# odd, >patch extents exercise overlap + tail-flush windows on every axis
VOL_SHAPE = (36, 40, 28)
MASKS = [
    [True, True, True, True],
    [False, True, False, True],
    [False, False, True, False],
]


def _hd95_binary(pred, target, voxelspacing=None, connectivity=1):
    """medpy.metric.hd95 drop-in for binary volumes: symmetric 95th-
    percentile surface distance via exact euclidean distance transforms.
    (Unit voxel spacing only — the reference passes (1, 1, 1).)"""
    from scipy import ndimage

    pred = pred.astype(bool)
    target = target.astype(bool)

    def surface(m):
        eroded = ndimage.binary_erosion(m)
        return m & ~eroded

    sp, st = surface(pred), surface(target)
    # distance from every voxel to the OTHER volume's surface
    dt_t = ndimage.distance_transform_edt(~st)
    dt_p = ndimage.distance_transform_edt(~sp)
    d1 = dt_t[sp]
    d2 = dt_p[st]
    return float(np.percentile(np.hstack([d1, d2]), 95))


@pytest.fixture(scope="module")
def ref_predict(monkeypatch_module=None):
    """Import the reference's predict module with CPU + dependency shims."""
    import torch

    if "medpy" not in sys.modules:
        medpy = types.ModuleType("medpy")
        metric = types.ModuleType("medpy.metric")
        metric.hd95 = _hd95_binary
        medpy.metric = metric
        sys.modules["medpy"] = medpy
        sys.modules["medpy.metric"] = metric
    if "nibabel" not in sys.modules:
        sys.modules["nibabel"] = types.ModuleType("nibabel")
    sys.path.insert(0, REF_CODE)
    from utils import predict as ref_predict_mod

    # CPU shims: the reference hard-codes .cuda() on tensors and modules
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    ref_predict_mod.patch_size = PATCH
    return ref_predict_mod


def _make_wrapped_torch_model():
    """Random-init reference RFNet, briefly trained on the synthetic case so
    predictions are structured (argmax not dominated by near-ties), wrapped
    with a .module attribute like nn.DataParallel (predict.py:211)."""
    import torch

    from models import rfnet as torch_rfnet_mod

    torch.manual_seed(1037)
    model = torch_rfnet_mod.Model(num_cls=4)

    class Wrap(torch.nn.Module):
        def __init__(self, m):
            super().__init__()
            self.module = m

        def forward(self, *a, **k):
            return self.module(*a, **k)

    return Wrap(model)


def _train_briefly(wrapped, x, seg_onehot, steps=3):
    """A few AdamW steps on the reference model's own training losses
    (baseline branch: fuse + sep + prm, train.py:374-420 shape) so the
    transplanted weights are not pure noise. Trains on a PATCH^3 crop over
    the lesion: the reference decoder's skip/upsample shapes require
    /8-divisible extents (the reference always trains on 80^3 crops,
    never whole odd-shaped volumes)."""
    import torch

    model = wrapped.module
    model.train()
    model.is_training = True
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3)
    x = x[:, 8:8 + PATCH, 10:10 + PATCH, 6:6 + PATCH]
    seg_onehot = seg_onehot[:, 8:8 + PATCH, 10:10 + PATCH, 6:6 + PATCH]
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))).float()
    tgt = torch.from_numpy(
        np.transpose(seg_onehot, (0, 4, 1, 2, 3))).float()
    mask = torch.ones(1, 4, dtype=torch.bool)
    for _ in range(steps):
        out = model(xt, mask, tgt, 1.0)
        loss = sum(o.float().mean() for o in out[1:] if torch.is_tensor(o))
        opt.zero_grad()
        loss.backward()
        opt.step()
    model.eval()
    model.is_training = False


def _read_rows(path):
    with open(path) as f:
        return [[float(v) for v in row] for row in csv.reader(f) if row]


@pytest.fixture(scope="module")
def fidelity_setup(tmp_path_factory):
    """One synthetic case, reference-evaluated and ours-evaluated."""
    rng = np.random.default_rng(1037)
    x = rng.standard_normal((1,) + VOL_SHAPE + (4,)).astype(np.float32)
    # blobby 4-class segmentation with a small ET region (class 3)
    seg = np.zeros(VOL_SHAPE, np.int64)
    seg[8:22, 10:26, 6:18] = 1
    seg[12:19, 14:22, 8:14] = 2
    seg[14:17, 16:19, 9:12] = 3
    seg_onehot = np.eye(4, dtype=np.float32)[seg][None]
    return x, seg


def test_csv_rows_match_reference(ref_predict, fidelity_setup, tmp_path):
    import jax.numpy as jnp
    import torch

    from passion_tpu.engine.evaluator import test_dice_hd95_softmax
    from passion_tpu.engine.sliding_window import SlidingWindowInference
    from passion_tpu.interop import rfnet_params_from_torch
    from passion_tpu.models.rfnet import RFNet

    x, seg = fidelity_setup
    seg_onehot = np.eye(4, dtype=np.float32)[seg][None]

    wrapped = _make_wrapped_torch_model()
    _train_briefly(wrapped, x, seg_onehot)

    # --- reference evaluator (their code, their CSV) ---
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))).float()
    tt = torch.from_numpy(seg[None]).long()
    ref_csv = str(tmp_path / "ref.csv")
    for m in MASKS:
        loader = [(xt, tt, ["case0"])]
        ref_predict.test_dice_hd95_softmax(
            loader, wrapped, dataname="BraTS/BRATS2020", feature_mask=m,
            mask_name="m", csv_name=ref_csv)

    # --- our evaluator on transplanted weights (fp32 parity mode) ---
    sd = {k: v.detach().numpy()
          for k, v in wrapped.module.state_dict().items()}
    params = rfnet_params_from_torch(sd)
    ours = RFNet(num_cls=4, mask_type="idt")
    engine = SlidingWindowInference(ours.apply, num_cls=4, patch=PATCH,
                                    window_batch=4,
                                    compute_dtype=jnp.float32)
    our_csv = str(tmp_path / "ours.csv")
    batch = {"x": x, "target": seg[None], "name": ["case0"]}
    for m in MASKS:
        test_dice_hd95_softmax([batch], engine, params,
                               feature_mask=m, mask_name="m",
                               csv_name=our_csv)

    ref_rows = _read_rows(ref_csv)
    our_rows = _read_rows(our_csv)
    assert len(ref_rows) == len(our_rows) == len(MASKS)
    for m, r, o in zip(MASKS, ref_rows, our_rows):
        assert len(r) == len(o) == 8  # 4 Dice + 4 HD95 columns
        np.testing.assert_allclose(o[:4], r[:4], atol=1e-3,
                                   err_msg=f"Dice row, mask {m}")
        np.testing.assert_allclose(o[4:], r[4:], atol=1e-2,
                                   err_msg=f"HD95 row, mask {m}")
