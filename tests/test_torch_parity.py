"""Weight-transplant parity vs the PyTorch reference models.

Loads the reference model definitions from /root/reference/code (oracle
only — no code is copied), transplants a randomly initialized state_dict
into our flax backbone via passion_tpu.interop, and asserts the fused
softmax predictions agree on the same input. This is the one test that
proves Dice parity is attainable without BraTS data: any drift in padding
mode, norm placement, activation order, or decoder wiring fails it.
"""

import os
import sys

import numpy as np
import pytest

REF_CODE = "/root/reference/code"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_CODE),
                                reason="reference code not available")


@pytest.fixture(scope="module")
def torch_rfnet():
    sys.path.insert(0, REF_CODE)
    import torch
    torch.manual_seed(1037)
    from models import rfnet as torch_rfnet_mod

    model = torch_rfnet_mod.Model(num_cls=4)
    model.eval()
    model.is_training = False
    return model


def _torch_predict(model, x_np, mask_np):
    import torch

    with torch.no_grad():
        x = torch.from_numpy(np.transpose(x_np, (0, 4, 1, 2, 3)))  # NCHWD
        mask = torch.from_numpy(mask_np)
        out = model(x, mask)
    return np.transpose(out.numpy(), (0, 2, 3, 4, 1))  # back to NHWDC


@pytest.fixture(scope="module")
def torch_mmformer():
    sys.path.insert(0, REF_CODE)
    import torch
    torch.manual_seed(1037)
    from models import mmformer as torch_mmformer_mod

    model = torch_mmformer_mod.Model(num_cls=4)
    model.eval()
    model.is_training = False
    return model


@pytest.mark.slow
@pytest.mark.parametrize("mask", [
    [True, True, True, True],
    [False, False, True, True],
])
def test_mmformer_transplant_inference_parity(torch_mmformer, mask):
    """mmFormer weight transplant: the reference hardcodes a 5^3 bottleneck
    token grid (mmformer.py:14,417), so parity must run at the full 80^3
    patch — slow on CPU but the only input size the torch model accepts."""
    from passion_tpu.interop import mmformer_params_from_torch
    from passion_tpu.models.mmformer import MMFormer

    sd = {k: v.detach().numpy() for k, v in torch_mmformer.state_dict().items()}
    params = mmformer_params_from_torch(sd)

    rng = np.random.default_rng(11)
    s = 80
    x = rng.standard_normal((1, s, s, s, 4)).astype(np.float32)
    mask_np = np.asarray([mask], bool)

    ours = MMFormer(num_cls=4, mask_type="idt", patch_size=s)
    pred_jax = np.asarray(ours.apply(params, x, mask_np))
    pred_torch = _torch_predict(torch_mmformer, x, mask_np)

    assert pred_jax.shape == pred_torch.shape == (1, s, s, s, 4)
    np.testing.assert_allclose(pred_jax, pred_torch, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("mask", [
    [True, True, True, True],
    [False, True, False, False],
    [True, False, True, True],
])
@pytest.mark.slow
def test_rfnet_transplant_inference_parity(torch_rfnet, mask):
    from passion_tpu.interop import rfnet_params_from_torch
    from passion_tpu.models.rfnet import RFNet

    sd = {k: v.detach().numpy() for k, v in torch_rfnet.state_dict().items()}
    params = rfnet_params_from_torch(sd)

    rng = np.random.default_rng(7)
    s = 32  # spatial size only needs divisibility by 8 (3 downsamples)
    x = rng.standard_normal((1, s, s, s, 4)).astype(np.float32)
    mask_np = np.asarray([mask], bool)

    ours = RFNet(num_cls=4, mask_type="idt")
    pred_jax = np.asarray(ours.apply(params, x, mask_np))

    # the reference zeroes absent modalities via MaskModal inside forward
    pred_torch = _torch_predict(torch_rfnet, x, mask_np)

    assert pred_jax.shape == pred_torch.shape == (1, s, s, s, 4)
    np.testing.assert_allclose(pred_jax, pred_torch, atol=2e-4, rtol=1e-3)


@pytest.fixture(scope="module")
def torch_m2ftrans():
    sys.path.insert(0, REF_CODE)
    import torch
    torch.manual_seed(1037)
    from models import m2ftrans as torch_m2f_mod

    model = torch_m2f_mod.Model(num_cls=4)
    model.eval()
    model.is_training = False
    return model


@pytest.mark.slow
@pytest.mark.parametrize("mask", [
    [True, True, True, True],
    [True, False, False, True],
])
def test_m2ftrans_transplant_inference_parity(torch_m2ftrans, mask,
                                              monkeypatch):
    """M2FTrans weight transplant: like mmFormer, the reference hardcodes
    the 5^3 bottleneck token grid (m2ftrans.py:20-23), so parity runs at the
    full 80^3 patch. The reference's attention-mask path calls
    `.cuda(non_blocking=True)` (m2ftrans.py:350) which on CPU torch is a
    no-op error — monkeypatched to identity for the oracle run (undone at
    teardown)."""
    import torch

    if not torch.cuda.is_available():
        monkeypatch.setattr(torch.Tensor, "cuda",
                            lambda self, *a, **k: self)  # CPU oracle

    from passion_tpu.interop import m2ftrans_params_from_torch
    from passion_tpu.models.m2ftrans import M2FTrans

    sd = {k: v.detach().numpy()
          for k, v in torch_m2ftrans.state_dict().items()}
    params = m2ftrans_params_from_torch(sd)

    rng = np.random.default_rng(13)
    s = 80
    x = rng.standard_normal((1, s, s, s, 4)).astype(np.float32)
    mask_np = np.asarray([mask], bool)

    ours = M2FTrans(num_cls=4, mask_type="idt", patch_size=s)
    pred_jax = np.asarray(ours.apply(params, x, mask_np))
    pred_torch = _torch_predict(torch_m2ftrans, x, mask_np)

    assert pred_jax.shape == pred_torch.shape == (1, s, s, s, 4)
    np.testing.assert_allclose(pred_jax, pred_torch, atol=2e-3, rtol=1e-2)
