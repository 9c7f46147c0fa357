"""Training-forward equivalence of the space-to-depth execution paths.

The S2D polyphase execution (ops/s2d.py) of the encoder stage-1 / stage-2
blocks AND the sep/fusion decoders' scale-1 stages claims to be EXACT — the
same math re-indexed onto the block grid with an identical param tree. These
tests pin that claim end-to-end per backbone: `train_losses` with the S2D
paths on equals the canonical execution on the same parameters.

(The torch transplant parity tests, tests/test_train_parity.py, cover the
default path at 80^3; these cover the s2d-on/off switch cheaply at tiny
shapes so a re-indexing bug can't hide behind the default.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from passion_tpu.models.m2ftrans import M2FTrans
from passion_tpu.models.mmformer import MMFormer
from passion_tpu.models.rfnet import RFNet

B = 1
KEYS = ("fuse_pred", "prm_loss", "sep_loss", "kl_loss", "proto_loss", "dist")


def _run_pair(model_on, model_off, S, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, S, S, S, 4)), jnp.float32)
    mask = jnp.asarray([[True, True, False, True]])
    lab = rng.integers(0, 4, size=(B, S, S, S))
    lab[:, 0, 0, :4] = np.arange(4)
    target = jnp.asarray(np.eye(4, dtype=np.float32)[lab])
    cls = type(model_on)
    params = model_off.init(jax.random.PRNGKey(1), x, mask, target, 1.0,
                            True, method=cls.train_losses)
    out_on = model_on.apply(params, x, mask, target, 4.0, True,
                            method=cls.train_losses)
    out_off = model_off.apply(params, x, mask, target, 4.0, True,
                              method=cls.train_losses)
    for k in KEYS:
        a, b = np.asarray(out_on[k]), np.asarray(out_off[k])
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=5e-5 * scale, rtol=5e-4,
                                   err_msg=f"{cls.__name__}.{k}")


@pytest.mark.slow
def test_rfnet_train_losses_s2d_equivalence():
    kw = dict(num_cls=4, basic_dims=4, mask_type="idt")
    _run_pair(RFNet(use_s2d=True, **kw), RFNet(use_s2d=False, **kw), S=16)


@pytest.mark.slow
def test_mmformer_train_losses_s2d_equivalence():
    kw = dict(num_cls=4, basic_dims=2, mask_type="idt", patch_size=32,
              trans_dim=16, mlp_dim=32, heads=4, depth=1)
    _run_pair(MMFormer(use_s2d=True, **kw), MMFormer(use_s2d=False, **kw),
              S=32)


@pytest.mark.slow
def test_m2ftrans_train_losses_s2d_equivalence():
    kw = dict(num_cls=4, basic_dims=2, mask_type="idt", patch_size=32,
              heads=4, mlp_dim=32, depth=2)
    _run_pair(M2FTrans(use_s2d=True, **kw), M2FTrans(use_s2d=False, **kw),
              S=32)
