"""RFNet backbone: shape, masking-semantics, and jit-compile tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from passion_tpu.models.rfnet import RFNet

B, S, C = 2, 16, 4  # tiny spatial size (divisible by 8), 4 modalities


@pytest.fixture(scope="module")
def rfnet_setup():
    model = RFNet(num_cls=4, basic_dims=4, mask_type="idt")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, S, S, S, C)),
                    jnp.float32)
    mask = jnp.asarray([[True, False, True, False], [True, True, True, True]])
    target = jnp.zeros((B, S, S, S, 4), jnp.float32)
    from passion_tpu.models import init_params_host
    params = init_params_host(model, seed=0, patch_size=S, batch_size=B)
    return model, params, x, mask


def test_infer_shapes_and_softmax(rfnet_setup):
    model, params, x, mask = rfnet_setup
    pred = jax.jit(model.apply)(params, x, mask)
    assert pred.shape == (B, S, S, S, 4)
    np.testing.assert_allclose(np.asarray(pred.sum(-1)), 1.0, rtol=1e-5)


def test_absent_modalities_do_not_affect_prediction(rfnet_setup):
    """idt zeroes absent modality inputs: perturbing them must be a no-op."""
    model, params, x, mask = rfnet_setup
    x2 = x.at[..., 1].set(999.0).at[..., 3].set(-999.0)
    m = jnp.asarray([[True, False, True, False]] * B)
    p1 = model.apply(params, x, m)
    p2 = model.apply(params, x2, m)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)


def test_train_losses_shapes_and_gating(rfnet_setup):
    model, params, x, mask = rfnet_setup
    lab = np.random.default_rng(1).integers(0, 4, size=(B, S, S, S))
    lab[:, 0, 0, :4] = np.arange(4)  # all classes present per sample
    target = jnp.asarray(np.eye(4, dtype=np.float32)[lab])

    out = jax.jit(
        lambda p, x_, m_, t_: model.apply(
            p, x_, m_, t_, 4.0, True, method=RFNet.train_losses)
    )(params, x, mask, target)

    assert out["fuse_pred"].shape == (B, S, S, S, 4)
    assert out["prm_loss"].shape == (B, 1)
    for k in ("sep_loss", "kl_loss", "proto_loss", "dist"):
        assert out[k].shape == (B, 4), k
    # idt gating: sample 0 is missing t1ce (m=1) and t2 (m=3)
    sep = np.asarray(out["sep_loss"])
    assert sep[0, 1] == 0.0 and sep[0, 3] == 0.0
    assert sep[0, 0] != 0.0 and sep[0, 2] != 0.0
    assert (np.asarray(out["kl_loss"])[0, [1, 3]] == 0.0).all()
    # all losses finite
    for k in ("prm_loss", "sep_loss", "kl_loss", "proto_loss", "dist"):
        assert np.isfinite(np.asarray(out[k])).all(), k


def test_train_fuse_pred_matches_infer(rfnet_setup):
    model, params, x, mask = rfnet_setup
    lab = np.random.default_rng(1).integers(0, 4, size=(B, S, S, S))
    target = jnp.asarray(np.eye(4, dtype=np.float32)[lab])
    infer = model.apply(params, x, mask)
    train = model.apply(params, x, mask, target, 1.0, False,
                        method=RFNet.train_losses)
    np.testing.assert_allclose(np.asarray(infer), np.asarray(train["fuse_pred"]),
                               atol=1e-6)


@pytest.mark.slow
def test_gradients_flow(rfnet_setup):
    model, params, x, mask = rfnet_setup
    lab = np.random.default_rng(1).integers(0, 4, size=(B, S, S, S))
    lab[:, 0, 0, :4] = np.arange(4)
    target = jnp.asarray(np.eye(4, dtype=np.float32)[lab])

    def loss_fn(p):
        out = model.apply(p, x, mask, target, 4.0, True,
                          method=RFNet.train_losses)
        return (out["prm_loss"].sum() + out["sep_loss"].sum()
                + out["kl_loss"].sum() + out["proto_loss"].sum())

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(g)).all() for g in leaves)
