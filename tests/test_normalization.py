"""Normalization-zoo behaviour tests (VERDICT round-1 item 8: the four
conditional variants + NoneNorm2d from reference ``models/
normalization.py:28-139`` that round 1 left out)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdm_tpu.models.normalization import (
    ConditionalBatchNorm2d,
    ConditionalInstanceNorm2d,
    ConditionalNoneNorm2d,
    ConditionalVarianceNorm2d,
    InstanceNorm2d,
    NoneNorm2d,
)

KEY = jax.random.PRNGKey(0)
X = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 6)) * 3.0 + 1.5
Y = jnp.array([0, 1, 2, 1])


@pytest.mark.parametrize("cls", [ConditionalBatchNorm2d,
                                 ConditionalInstanceNorm2d,
                                 ConditionalVarianceNorm2d,
                                 ConditionalNoneNorm2d])
def test_conditional_shapes_and_class_dependence(cls):
    m = cls(num_classes=3)
    # batch norm mutates running stats in train mode; evaluate with the
    # init-time stats instead (the affine path under test is the same)
    kw = {"train": False} if cls is ConditionalBatchNorm2d else {}
    params = m.init(KEY, X, Y, **kw)
    out = m.apply(params, X, Y, **kw)
    assert out.shape == X.shape
    assert np.all(np.isfinite(np.asarray(out)))
    # swapping a sample's class must change its output (class-dependent
    # affine) but leave the other samples untouched
    out2 = m.apply(params, X, jnp.array([1, 1, 2, 1]), **kw)
    assert not np.allclose(out[0], out2[0])
    np.testing.assert_allclose(out[1:], out2[1:], rtol=1e-6)


def test_conditional_instance_norm_normalizes():
    m = ConditionalInstanceNorm2d(num_classes=3, bias=False)
    params = m.init(KEY, X, Y)
    out = np.asarray(m.apply(params, X, Y))
    gamma = np.asarray(params["params"]["embed"])[np.asarray(Y)]
    # undoing the per-class gain leaves unit-variance, zero-mean maps
    h = out / gamma[:, None, None, :]
    np.testing.assert_allclose(h.mean((1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(h.std((1, 2)), 1.0, atol=1e-2)


def test_conditional_variance_norm_scale_only():
    m = ConditionalVarianceNorm2d(num_classes=3)
    params = m.init(KEY, X, Y)
    out = np.asarray(m.apply(params, X, Y))
    gamma = np.asarray(params["params"]["embed"])[np.asarray(Y)]
    h = out / gamma[:, None, None, :]
    # variance-normalised but NOT centred (reference :86-93)
    np.testing.assert_allclose(h.std((1, 2)), 1.0, atol=1e-2)
    assert np.abs(h.mean((1, 2))).max() > 0.05
    # init N(1, 0.02)
    emb = np.asarray(params["params"]["embed"])
    assert abs(emb.mean() - 1.0) < 0.02


def test_conditional_none_norm_is_affine_of_input():
    m = ConditionalNoneNorm2d(num_classes=3)
    params = m.init(KEY, X, Y)
    out = np.asarray(m.apply(params, X, Y))
    emb = np.asarray(params["params"]["embed"])[np.asarray(Y)]
    C = X.shape[-1]
    expected = emb[:, None, None, :C] * np.asarray(X) + emb[:, None, None, C:]
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_none_norm_identity():
    m = NoneNorm2d()
    params = m.init(KEY, X)
    np.testing.assert_array_equal(np.asarray(m.apply(params, X)),
                                  np.asarray(X))


def test_batch_norm_train_vs_eval_stats():
    m = ConditionalBatchNorm2d(num_classes=3)
    vars_ = m.init(KEY, X, Y, train=True)
    out, updates = m.apply(vars_, X, Y, train=True,
                           mutable=["batch_stats"])
    assert out.shape == X.shape
    # eval mode consumes the running stats without mutating them
    vars2 = {"params": vars_["params"],
             "batch_stats": updates["batch_stats"]}
    out_eval = m.apply(vars2, X, Y, train=False)
    assert out_eval.shape == X.shape
    assert np.all(np.isfinite(np.asarray(out_eval)))


def test_unconditional_instance_norm_matches_reference_semantics():
    m = InstanceNorm2d(affine=False)
    params = m.init(KEY, X)
    out = np.asarray(m.apply(params, X))
    np.testing.assert_allclose(out.mean((1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std((1, 2)), 1.0, atol=1e-2)
