"""Training-forward weight-transplant parity vs the PyTorch reference.

Round 1 proved the *inference* path matches the reference; this file proves
the *training* forward — the full 6-output composition (fuse_pred softmax +
per-sample prm/sep/kl/proto/dist tensors) with its PRM weight-halving
schedule, teacher-detach placement, and per-path `mask * masks_modk` gating
— produces the same values (reference rfnet.py:246-379,
mmformer.py:449-657, m2ftrans.py:568-769). This is the parity surface that
guards a 300-epoch PASSION run against silent composition drift.

mmFormer oracle note: the reference masks the T2 path's intra-token stack
with masks_mod2 instead of masks_mod3 (reference mmformer.py:522) — an
evident copy-paste bug our rebuild deliberately fixes (documented deviation,
passion_tpu/models/mmformer.py:24-27). The oracle here is the reference
source with THAT ONE TOKEN corrected at load time, so exact agreement on
the T2 kl/proto/dist column both verifies the composition and PINS the
deviation: a regression to the reference's buggy behavior (or to any other
wiring) breaks column 3 against the fixed oracle.
"""

import os
import sys

import numpy as np
import pytest

REF_CODE = "/root/reference/code"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_CODE),
                                reason="reference code not available")

TEMP = 4.0  # canonical --temp (reference scripts/train.sh:13)


@pytest.fixture(autouse=True)
def _cpu_cuda_shim(monkeypatch):
    """The reference training path hard-codes .cuda() on CPU tensors
    (criterions.py:115,153, blocks.py:289, m2ftrans.py:350); shim it to
    identity for the CPU oracle runs (undone at teardown)."""
    _ref_path()
    import torch

    if not torch.cuda.is_available():
        monkeypatch.setattr(torch.Tensor, "cuda",
                            lambda self, *a, **k: self)


def _ref_path():
    if REF_CODE not in sys.path:
        sys.path.insert(0, REF_CODE)


def _make_batch(rng, b, s, masks, missing_cls=None):
    """Random volume + one-hot labels with all 4 classes present
    (optionally class `missing_cls` removed from every sample to hit the
    prototype class-skip path, reference criterions.py:155-157)."""
    x = rng.standard_normal((b, s, s, s, 4)).astype(np.float32)
    lab = rng.integers(0, 4, size=(b, s, s, s))
    if missing_cls is not None:
        lab[lab == missing_cls] = 0
    target = np.eye(4, dtype=np.float32)[lab]
    mask = np.asarray(masks, bool)
    assert mask.shape == (b, 4)
    return x, target, mask


def _torch_train_outputs(model, x, mask, target, mask_type):
    """Run the reference training forward (is_training branch) with dropout
    off (model.eval(); the branch is selected by the hand-set `is_training`
    attribute, reference train.py:212,91-92)."""
    import torch

    model.eval()
    model.is_training = True
    model.use_passion = True
    model.mask_type = mask_type
    with torch.no_grad():
        out = model(
            torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))),
            torch.from_numpy(mask),
            torch.from_numpy(np.transpose(target, (0, 4, 1, 2, 3))),
            temp=TEMP,
        )
    fuse, prm, sep, kl, proto, dist = [o.numpy() for o in out]
    return dict(
        fuse_pred=np.transpose(fuse, (0, 2, 3, 4, 1)),
        prm_loss=prm, sep_loss=sep, kl_loss=kl, proto_loss=proto, dist=dist,
    )


def _jax_train_outputs(model, params, x, mask, target):
    out = model.apply(params, x, mask, target, TEMP, True,
                      method=type(model).train_losses)
    return {k: np.asarray(v) for k, v in out.items()}


def _assert_outputs_match(ours, ref, atol_pred=2e-4, atol_loss=2e-3):
    np.testing.assert_allclose(ours["fuse_pred"], ref["fuse_pred"],
                               atol=atol_pred, rtol=1e-3, err_msg="fuse_pred")
    for k in ("prm_loss", "sep_loss", "kl_loss", "proto_loss", "dist"):
        np.testing.assert_allclose(ours[k], ref[k], atol=atol_loss, rtol=2e-3,
                                   err_msg=k)


# ---------------------------------------------------------------------------
# RFNet — fast enough at 32^3 to run in the default suite
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def torch_rfnet_train():
    _ref_path()
    import torch
    torch.manual_seed(1037)
    from models import rfnet as ref

    return ref.Model(num_cls=4)


@pytest.mark.parametrize("mask_type,masks,missing_cls", [
    ("idt", [[True, True, False, True], [False, True, True, False]], None),
    ("idt", [[True, False, False, False], [True, True, True, True]], 3),
    ("pdt", [[True, True, True, True], [True, False, True, True]], None),
])
@pytest.mark.slow
def test_rfnet_train_forward_parity(torch_rfnet_train, mask_type, masks,
                                    missing_cls):
    """All six training outputs match the reference composition
    (rfnet.py:267-379) after weight transplant: which prm scale gets which
    weight/up-op, which de_x feature feeds the prototype loss, teacher
    detach placement, and the idt `mask * masks_modk` gating."""
    from passion_tpu.interop import rfnet_params_from_torch
    from passion_tpu.models.rfnet import RFNet

    sd = {k: v.detach().numpy()
          for k, v in torch_rfnet_train.state_dict().items()}
    params = rfnet_params_from_torch(sd)

    rng = np.random.default_rng(23)
    x, target, mask = _make_batch(rng, len(masks), 32, masks, missing_cls)

    ours = _jax_train_outputs(
        RFNet(num_cls=4, mask_type=mask_type), params, x, mask, target)
    ref = _torch_train_outputs(torch_rfnet_train, x, mask, target, mask_type)
    _assert_outputs_match(ours, ref)


# ---------------------------------------------------------------------------
# mmFormer — the reference hardcodes the 5^3 bottleneck grid, so training
# parity must run at the full 80^3 patch (slow, CPU)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def torch_mmformer_t2fixed():
    """Reference mmformer.Model with the T2-path x5 mask bug corrected
    (masks_mod2 -> masks_mod3 at reference mmformer.py:522) — the oracle for
    our documented deviation. Only that one line is altered; the patched
    source is executed as a fresh module, weights are torch-init as usual."""
    import types

    _ref_path()
    import torch
    torch.manual_seed(1037)
    import models.mmformer as ref_mod

    src = open(ref_mod.__file__).read()
    buggy = ("x5_t2 = self.masker(torch.stack((flair_intra_x5, t1ce_intra_x5,"
             " t1_intra_x5, t2_intra_x5), dim=1), masks_mod2)")
    assert src.count(buggy) == 1, "reference T2-mask bug line not found"
    fixed_src = src.replace(buggy, buggy[:-len("masks_mod2)")] + "masks_mod3)")

    mod = types.ModuleType("mmformer_t2fixed")
    mod.__file__ = ref_mod.__file__
    exec(compile(fixed_src, ref_mod.__file__, "exec"), mod.__dict__)
    return mod.Model(num_cls=4)


@pytest.mark.slow
def test_mmformer_train_forward_parity(torch_mmformer_t2fixed):
    """mmFormer training composition parity (mmformer.py:449-657) incl. the
    vmapped 5-pass InterFormer+decoder realization, at 80^3 against the
    T2-fixed oracle. Column 3 of kl/proto/dist pins the documented T2-mask
    deviation (see fixture)."""
    from passion_tpu.interop import mmformer_params_from_torch
    from passion_tpu.models.mmformer import MMFormer

    sd = {k: v.detach().numpy()
          for k, v in torch_mmformer_t2fixed.state_dict().items()}
    params = mmformer_params_from_torch(sd)

    rng = np.random.default_rng(29)
    x, target, mask = _make_batch(rng, 1, 80, [[True, False, True, True]])

    ours = _jax_train_outputs(
        MMFormer(num_cls=4, mask_type="idt", patch_size=80),
        params, x, mask, target)
    ref = _torch_train_outputs(torch_mmformer_t2fixed, x, mask, target, "idt")
    _assert_outputs_match(ours, ref, atol_pred=5e-4, atol_loss=5e-3)


# ---------------------------------------------------------------------------
# M2FTrans — 80^3 for the same reason (slow, CPU)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_m2ftrans_train_forward_parity():
    """M2FTrans training composition parity (m2ftrans.py:568-769): 5-pass
    masked-Bottleneck + Weight_Attention realization, prm_fusion deep
    supervision at 5 scales, teacher detach, idt gating."""
    _ref_path()
    import torch
    torch.manual_seed(1037)
    from models import m2ftrans as ref_mod

    model = ref_mod.Model(num_cls=4)

    from passion_tpu.interop import m2ftrans_params_from_torch
    from passion_tpu.models.m2ftrans import M2FTrans

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = m2ftrans_params_from_torch(sd)

    rng = np.random.default_rng(31)
    x, target, mask = _make_batch(rng, 1, 80, [[True, True, False, True]])

    ours = _jax_train_outputs(
        M2FTrans(num_cls=4, mask_type="idt", patch_size=80),
        params, x, mask, target)
    ref = _torch_train_outputs(model, x, mask, target, "idt")
    _assert_outputs_match(ours, ref, atol_pred=2e-3, atol_loss=8e-3)
