"""mmFormer backbone: shape, masking-semantics, and jit-compile tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from passion_tpu.models.mmformer import MMFormer

B, S = 2, 32  # spatial divisible by 16 -> (S/16)^3 = 8 tokens/modality


@pytest.fixture(scope="module")
def mmformer_setup():
    model = MMFormer(num_cls=4, basic_dims=2, mask_type="idt", patch_size=S,
                     trans_dim=16, mlp_dim=32, heads=4, depth=1)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, S, S, S, 4)),
                    jnp.float32)
    mask = jnp.asarray([[False, True, False, False], [True, True, True, True]])
    target = jnp.zeros((B, S, S, S, 4), jnp.float32)
    from passion_tpu.models import init_params_host
    params = init_params_host(model, seed=0, patch_size=S, batch_size=B)
    return model, params, x, mask


def test_infer_shapes_and_softmax(mmformer_setup):
    model, params, x, mask = mmformer_setup
    pred = jax.jit(model.apply)(params, x, mask)
    assert pred.shape == (B, S, S, S, 4)
    np.testing.assert_allclose(np.asarray(pred.sum(-1)), 1.0, rtol=1e-5)


def test_absent_modalities_do_not_affect_prediction(mmformer_setup):
    model, params, x, mask = mmformer_setup
    x2 = x.at[..., 0].set(123.0).at[..., 2].set(-55.0).at[..., 3].set(9.0)
    m = jnp.asarray([[False, True, False, False]] * B)
    p1 = model.apply(params, x, m)
    p2 = model.apply(params, x2, m)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


@pytest.mark.slow
def test_train_losses_shapes_gating_and_grads(mmformer_setup):
    model, params, x, mask = mmformer_setup
    lab = np.random.default_rng(1).integers(0, 4, size=(B, S, S, S))
    lab[:, 0, 0, :4] = np.arange(4)
    target = jnp.asarray(np.eye(4, dtype=np.float32)[lab])

    out = jax.jit(
        lambda p: model.apply(p, x, mask, target, 4.0, True,
                              method=MMFormer.train_losses)
    )(params)
    assert out["fuse_pred"].shape == (B, S, S, S, 4)
    assert out["prm_loss"].shape == (B, 1)
    for k in ("sep_loss", "kl_loss", "proto_loss", "dist"):
        assert out[k].shape == (B, 4), k
        assert np.isfinite(np.asarray(out[k])).all(), k
    # sample 0 has only t1ce -> other columns gated to zero
    sep = np.asarray(out["sep_loss"])
    assert (sep[0, [0, 2, 3]] == 0.0).all() and sep[0, 1] != 0.0

    def loss_fn(p):
        o = model.apply(p, x, mask, target, 4.0, True,
                        method=MMFormer.train_losses)
        return (o["prm_loss"].sum() + o["sep_loss"].sum()
                + o["kl_loss"].sum() + o["proto_loss"].sum())

    grads = jax.grad(loss_fn)(params)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


@pytest.mark.slow
def test_dropout_rng_path(mmformer_setup):
    """Non-deterministic forward (dropout active) runs and differs by rng."""
    model, params, x, mask = mmformer_setup
    lab = np.random.default_rng(2).integers(0, 4, size=(B, S, S, S))
    target = jnp.asarray(np.eye(4, dtype=np.float32)[lab])
    o1 = model.apply(params, x, mask, target, 1.0, False, False,
                     method=MMFormer.train_losses,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = model.apply(params, x, mask, target, 1.0, False, False,
                     method=MMFormer.train_losses,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1["fuse_pred"]),
                           np.asarray(o2["fuse_pred"]))
