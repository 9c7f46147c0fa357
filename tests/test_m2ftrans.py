"""M2FTrans backbone: shape, masking-semantics, and jit-compile tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from passion_tpu.models.m2ftrans import M2FTrans

B, S = 2, 32  # (S/16)^3 = 8 bottleneck tokens per modality


@pytest.fixture(scope="module")
def m2f_setup():
    model = M2FTrans(num_cls=4, basic_dims=2, mask_type="idt", patch_size=S,
                     heads=4, mlp_dim=32, depth=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, S, S, S, 4)),
                    jnp.float32)
    mask = jnp.asarray([[False, False, True, False], [True, True, True, True]])
    target = jnp.zeros((B, S, S, S, 4), jnp.float32)
    from passion_tpu.models import init_params_host
    params = init_params_host(model, seed=0, patch_size=S, batch_size=B)
    return model, params, x, mask


def test_infer_shapes_and_softmax(m2f_setup):
    model, params, x, mask = m2f_setup
    pred = jax.jit(model.apply)(params, x, mask)
    assert pred.shape == (B, S, S, S, 4)
    np.testing.assert_allclose(np.asarray(pred.sum(-1)), 1.0, rtol=1e-5)


def test_absent_modalities_do_not_affect_prediction(m2f_setup):
    model, params, x, mask = m2f_setup
    x2 = x.at[..., 0].set(77.0).at[..., 1].set(-3.0).at[..., 3].set(11.0)
    m = jnp.asarray([[False, False, True, False]] * B)
    p1 = model.apply(params, x, m)
    p2 = model.apply(params, x2, m)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


@pytest.mark.slow
def test_train_losses_shapes_gating_and_grads(m2f_setup):
    model, params, x, mask = m2f_setup
    lab = np.random.default_rng(1).integers(0, 4, size=(B, S, S, S))
    lab[:, 0, 0, :4] = np.arange(4)
    target = jnp.asarray(np.eye(4, dtype=np.float32)[lab])

    out = jax.jit(
        lambda p: model.apply(p, x, mask, target, 4.0, True,
                              method=M2FTrans.train_losses)
    )(params)
    assert out["fuse_pred"].shape == (B, S, S, S, 4)
    assert out["prm_loss"].shape == (B, 1)
    for k in ("sep_loss", "kl_loss", "proto_loss", "dist"):
        assert out[k].shape == (B, 4), k
        assert np.isfinite(np.asarray(out[k])).all(), k
    sep = np.asarray(out["sep_loss"])
    assert (sep[0, [0, 1, 3]] == 0.0).all() and sep[0, 2] != 0.0

    def loss_fn(p):
        o = model.apply(p, x, mask, target, 4.0, True,
                        method=M2FTrans.train_losses)
        return (o["prm_loss"].sum() + o["sep_loss"].sum()
                + o["kl_loss"].sum() + o["proto_loss"].sum())

    grads = jax.grad(loss_fn)(params)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
