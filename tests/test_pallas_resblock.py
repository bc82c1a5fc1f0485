"""Fused resblock kernel: interpret-mode parity with the module path and
gradient correctness via the custom-VJP (jnp-recompute backward)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdm_tpu.models.layers import ResnetBlockDDPMpp
from rdm_tpu.ops.pallas.resblock import fused_resblock


@pytest.fixture(scope="module", params=[(64, 64), (64, 128)])
def setup(request):
    cin, cout = request.param
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 9, 9, cin)) * 0.5, jnp.float32)
    temb = jnp.asarray(rng.normal(size=(8, 256)), jnp.float32)
    blk = ResnetBlockDDPMpp(act=jax.nn.silu, out_ch=cout, dropout=0.0,
                            skip_rescale=True, init_scale=0.1)
    params = blk.init(jax.random.PRNGKey(0), x, temb)["params"]
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape) * 0.2, jnp.float32), params)
    return cin, cout, x, temb, blk, params


def _call_fused(params, x, temb, cin, cout, interpret=True):
    sc = params.get("shortcut")
    tembv = jax.nn.silu(temb) @ params["temb_proj"]["kernel"] + \
        params["temb_proj"]["bias"]
    return fused_resblock(
        x, tembv,
        params["norm0"]["scale"], params["norm0"]["bias"],
        params["conv0"]["conv"]["kernel"], params["conv0"]["conv"]["bias"],
        params["norm1"]["scale"], params["norm1"]["bias"],
        params["conv1"]["conv"]["kernel"], params["conv1"]["conv"]["bias"],
        sc["W"] if sc else None, sc["b"] if sc else None,
        groups0=min(cin // 4, 32), groups1=min(cout // 4, 32),
        skip_rescale=True, block_b=4, interpret=interpret)


def test_fused_resblock_matches_module(setup):
    cin, cout, x, temb, blk, params = setup
    ref = blk.apply({"params": params}, x, temb)
    out = _call_fused(params, x, temb, cin, cout)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_fused_resblock_grads_match(setup):
    cin, cout, x, temb, blk, params = setup

    def loss_ref(p, xx):
        return jnp.sum(jnp.cos(blk.apply({"params": p}, xx, temb)))

    def loss_pal(p, xx):
        return jnp.sum(jnp.cos(_call_fused(p, xx, temb, cin, cout)))

    l1, g1 = jax.value_and_grad(loss_ref, argnums=(0, 1))(params, x)
    l2, g2 = jax.value_and_grad(loss_pal, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(g2)[0]
    for (kp, a), (_, b) in zip(sorted(flat1, key=lambda t: str(t[0])),
                               sorted(flat2, key=lambda t: str(t[0]))):
        scale = max(float(jnp.abs(a).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3,
                                   atol=max(2e-3 * scale, 1e-4),
                                   err_msg=jax.tree_util.keystr(kp))


def test_module_pallas_gate_keeps_tree(setup):
    cin, cout, x, temb, blk, params = setup
    blk_p = ResnetBlockDDPMpp(act=jax.nn.silu, out_ch=cout, dropout=0.0,
                              skip_rescale=True, init_scale=0.1,
                              use_pallas=True, dtype=jnp.bfloat16)
    p2 = blk_p.init(jax.random.PRNGKey(0), x, temb)["params"]
    assert jax.tree.structure(p2) == jax.tree.structure(params)
