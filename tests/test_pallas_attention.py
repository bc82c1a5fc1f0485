"""Pallas fused attention: interpret-mode numerics vs the XLA module path
(TPU execution is exercised by bench.py on hardware)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdm_tpu.models.layers import AttnBlockpp
from rdm_tpu.ops.pallas.attention import attention_core, fused_attn_block


def test_attention_core_matches_xla():
    B, L, C = 16, 81, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    w = jax.nn.softmax(jnp.einsum("bqc,bkc->bqk", q, k) * C**-0.5, -1)
    ref = jnp.einsum("bqk,bkc->bqc", w, v)
    out = attention_core(q, k, v, interpret=True, block_b=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.fixture(scope="module")
def block_setup():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 9, 9, 64)), jnp.float32)
    blk = AttnBlockpp(skip_rescale=True, init_scale=0.1)
    params = blk.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape) * 0.3, jnp.float32), params)
    return x, blk, params


def test_fused_block_matches_module(block_setup):
    x, blk, params = block_setup
    ref = blk.apply({"params": params}, x)
    out = fused_attn_block(
        x, params["norm"]["scale"], params["norm"]["bias"],
        params["q"]["W"], params["q"]["b"], params["k"]["W"], params["k"]["b"],
        params["v"]["W"], params["v"]["b"], params["proj"]["W"], params["proj"]["b"],
        groups=16, skip_rescale=True, block_b=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_pallas_module_path_same_tree_and_output(block_setup):
    """AttnBlockpp(use_pallas=True) keeps the identical parameter tree and
    (on CPU via interpreter) identical outputs."""
    x, blk, params = block_setup
    blk_p = AttnBlockpp(skip_rescale=True, init_scale=0.1, use_pallas=True)
    p2 = blk_p.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(p2) == jax.tree.structure(params)
    ref = blk.apply({"params": params}, x)
    out = blk_p.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_fused_block_ragged_batch(block_setup):
    """Non-multiple-of-tile batches are padded and unpadded correctly."""
    x, blk, params = block_setup
    x5 = x[:5]
    ref = blk.apply({"params": params}, x5)
    out = fused_attn_block(
        x5, params["norm"]["scale"], params["norm"]["bias"],
        params["q"]["W"], params["q"]["b"], params["k"]["W"], params["k"]["b"],
        params["v"]["W"], params["v"]["b"], params["proj"]["W"], params["proj"]["b"],
        groups=16, skip_rescale=True, block_b=4, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_fused_block_custom_vjp_matches_autodiff(block_setup):
    """Gradients through the Pallas custom VJP (backward kernel) match
    autodiff of the XLA module path for every parameter and the input."""
    x, blk, params = block_setup

    def loss_ref(p, xx):
        return jnp.sum(jnp.sin(blk.apply({"params": p}, xx)) ** 2)

    def loss_pal(p, xx):
        out = fused_attn_block(
            xx, p["norm"]["scale"], p["norm"]["bias"],
            p["q"]["W"], p["q"]["b"], p["k"]["W"], p["k"]["b"],
            p["v"]["W"], p["v"]["b"], p["proj"]["W"], p["proj"]["b"],
            groups=16, skip_rescale=True, block_b=4, interpret=True)
        return jnp.sum(jnp.sin(out) ** 2)

    (l1, g1) = jax.value_and_grad(loss_ref, argnums=(0, 1))(params, x)
    (l2, g2) = jax.value_and_grad(loss_pal, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(g2)[0]
    for (kp, a), (_, b) in zip(sorted(flat1, key=lambda t: str(t[0])),
                               sorted(flat2, key=lambda t: str(t[0]))):
        # atol floor: d/d(bk) is analytically zero (softmax shift
        # invariance), so both sides are pure f32 roundoff there
        scale = max(float(jnp.abs(a).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=max(2e-3 * scale, 1e-4),
                                   err_msg=jax.tree_util.keystr(kp))
