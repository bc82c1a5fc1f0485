"""Training step tests: loss semantics, optimizer chain, EMA, and a short
overfitting run on a tiny model (the reference's empirical 'loss goes down'
check, SURVEY.md section 4, made into a real unit test)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdm_tpu.config import load_config
from rdm_tpu.models import NCSNpp
from rdm_tpu.sde import RVESDE
from rdm_tpu.training import (get_loss_fn, get_optimizer, init_train_state,
                              make_eval_step, make_train_step)


def tiny_model():
    return NCSNpp(nf=16, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(9,),
                  dropout=0.0, cond_drop_prob=0.5)


@pytest.fixture(scope="module")
def setup():
    cfg = load_config("train", overrides=[
        "model.nf=16", "model.ch_mult=[1,2]", "model.num_res_blocks=1",
        "model.dropout=0.0", "training.batch_size=16", "optim.warmup=10"])
    sde = RVESDE(cfg.sde.sigma_min, cfg.sde.sigma_max, cfg.sde.num_scales)
    model = tiny_model()
    tx = get_optimizer(cfg)
    state = init_train_state(model, tx, cfg, rng=jax.random.PRNGKey(0))
    return cfg, sde, model, tx, state


def test_loss_is_finite_positive(setup):
    cfg, sde, model, tx, state = setup
    loss_fn = get_loss_fn(sde, model, train=False, reduce_mean=False,
                          likelihood_weighting=False)
    batch = jax.random.uniform(jax.random.PRNGKey(1), (8, 9, 9, 1))
    labels = jax.random.uniform(jax.random.PRNGKey(2), (8, 1))
    loss = loss_fn(state.params, batch, labels, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss)) and float(loss) > 0


@pytest.mark.slow
def test_fresh_model_loss_magnitude(setup):
    # With a ~zero-output fresh model, loss ~= E[0.5 sum sigma^2 |score_hk|^2].
    # The reference logs ~20.9 at step 0 with the full model (BASELINE.md);
    # the exact value depends on data, but it must be O(1..100), not 1e6.
    cfg, sde, model, tx, state = setup
    loss_fn = get_loss_fn(sde, model, train=False, reduce_mean=False,
                          likelihood_weighting=False)
    batch = jax.random.uniform(jax.random.PRNGKey(1), (64, 9, 9, 1)) * 0.9 + 0.05
    labels = batch[:, 0, 0, :]
    loss = float(loss_fn(state.params, batch, labels, jax.random.PRNGKey(3)))
    assert 1.0 < loss < 500.0


@pytest.mark.slow  # ~40 s; the e2e trainer tests (slow tier) cover descent too
def test_loss_decreases_fast(setup):
    """Core-tier gradient-flow canary (a zeroed-gradient or broken
    optimizer regression must not survive the fast tier): a few steps on
    one fixed batch must lower the loss at a FIXED (t, z) probe — the
    injected-noise probe removes the random-t variance that makes the
    full overfit test (below, slow tier) need 60 steps."""
    cfg, sde, model, tx, state = setup
    step_fn = jax.jit(make_train_step(sde, model, tx))
    batch = jax.random.uniform(jax.random.PRNGKey(1), (16, 9, 9, 1)) * 0.9 + 0.05
    labels = batch[:, 0, 0, :]
    t_probe = jnp.full((16,), 0.3)
    z_probe = jax.random.normal(jax.random.PRNGKey(2), batch.shape)

    probe_fn = get_loss_fn(sde, model, train=False, reduce_mean=False,
                           likelihood_weighting=False)
    probe = jax.jit(lambda p: probe_fn(p, batch, labels, jax.random.PRNGKey(0),
                                       t=t_probe, z=z_probe))
    before = float(probe(state.params))
    key = jax.random.PRNGKey(42)
    for _ in range(12):
        key, k = jax.random.split(key)
        state, loss = step_fn(state, batch, labels, k)
        assert np.isfinite(float(loss))
    after = float(probe(state.params))
    assert after < before, (before, after)


@pytest.mark.slow
def test_train_step_updates_and_overfits(setup):
    cfg, sde, model, tx, state = setup
    step_fn = jax.jit(make_train_step(sde, model, tx))
    batch = jax.random.uniform(jax.random.PRNGKey(1), (16, 9, 9, 1)) * 0.9 + 0.05
    labels = batch[:, 0, 0, :]

    losses = []
    key = jax.random.PRNGKey(42)
    for i in range(60):
        key, k = jax.random.split(key)
        state, loss = step_fn(state, batch, labels, k)
        losses.append(float(loss))
    assert int(state.step) == 60
    assert all(np.isfinite(losses))
    # loss noisy (random t each step) but trending down
    assert np.mean(losses[-15:]) < np.mean(losses[:15])


def test_nonfinite_batch_skips_update(setup):
    """A NaN batch must not poison the parameters: the guarded step keeps
    params/opt_state/EMA unchanged and only advances the step counter
    (the reference merely warns and lets the update through)."""
    cfg, sde, model, tx, state = setup
    step_fn = jax.jit(make_train_step(sde, model, tx))
    key = jax.random.PRNGKey(7)
    good = jax.random.uniform(key, (16, 9, 9, 1)) * 0.9 + 0.05
    labels = good[:, 0, 0, :]

    # a few finite steps first so the warmup lr is nonzero
    for _ in range(3):
        key, k = jax.random.split(key)
        state, _ = step_fn(state, good, labels, k)

    bad = good.at[0, 0, 0, 0].set(jnp.nan)
    state2, loss = step_fn(state, bad, labels, key)
    assert not np.isfinite(float(loss))
    assert int(state2.step) == int(state.step) + 1
    for new, old in zip(jax.tree_util.tree_leaves(state2.params),
                        jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(new), np.asarray(old))
    for new, old in zip(jax.tree_util.tree_leaves(state2.ema),
                        jax.tree_util.tree_leaves(state.ema)):
        # allclose: the f64 decay scalar of the fresh state casts to f32
        # through the jit program even when no update happens
        np.testing.assert_allclose(np.asarray(new, np.float32),
                                   np.asarray(old, np.float32), rtol=1e-6)

    # and a finite batch still updates
    state3, loss = step_fn(state2, good, labels, key)
    assert np.isfinite(float(loss))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state3.params),
                       jax.tree_util.tree_leaves(state2.params)))
    assert changed


@pytest.mark.slow  # ~30 s of repeated step compiles; warmup schedule algebra
# is also pinned cheaply by the optimizer-chain unit test
def test_warmup_scales_first_updates(setup):
    cfg, sde, model, tx, state = setup
    step_fn = jax.jit(make_train_step(sde, model, tx))
    batch = jax.random.uniform(jax.random.PRNGKey(1), (16, 9, 9, 1))
    labels = batch[:, 0, 0, :]
    s1, _ = step_fn(state, batch, labels, jax.random.PRNGKey(0))
    # update norm at step 0 is 0 (lr = lr * 0/warmup), params unchanged
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), s1.params, state.params)
    assert max(jax.tree.leaves(diff)) == 0.0
    s2, _ = step_fn(s1, batch, labels, jax.random.PRNGKey(1))
    diff2 = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), s2.params, s1.params)
    assert max(jax.tree.leaves(diff2)) > 0.0


def test_ema_warmup_and_tracking(setup):
    cfg, sde, model, tx, state = setup
    step_fn = jax.jit(make_train_step(sde, model, tx))
    batch = jax.random.uniform(jax.random.PRNGKey(1), (16, 9, 9, 1))
    labels = batch[:, 0, 0, :]
    s = state
    for i in range(5):
        s, _ = step_fn(s, batch, labels, jax.random.PRNGKey(i))
    # with decay warmup (1+n)/(10+n), EMA at n=5 uses decay 6/15=0.4 —
    # shadow should be strictly between init params and live params
    p0 = state.params["out_conv"]["conv"]["bias"]
    pl = s.params["out_conv"]["conv"]["bias"]
    sh = s.ema.shadow_params["out_conv"]["conv"]["bias"]
    assert not np.allclose(np.asarray(sh), np.asarray(pl))
    assert int(s.ema.num_updates) == 5


def test_eval_step_uses_ema(setup):
    cfg, sde, model, tx, state = setup
    eval_fn = jax.jit(make_eval_step(sde, model))
    batch = jax.random.uniform(jax.random.PRNGKey(1), (8, 9, 9, 1))
    labels = batch[:, 0, 0, :]
    loss = eval_fn(state, batch, labels, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))


def test_likelihood_weighting_branch(setup):
    cfg, sde, model, tx, state = setup
    loss_fn = get_loss_fn(sde, model, train=False, reduce_mean=True,
                          likelihood_weighting=True)
    batch = jax.random.uniform(jax.random.PRNGKey(1), (8, 9, 9, 1))
    loss = loss_fn(state.params, batch, jnp.zeros((8, 1)), jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_remat_policies_match_gradients(setup):
    """training.remat recomputes the forward in the backward; the loss and
    gradients must match the no-remat program (same op sequence — any
    difference is fusion reassociation at the ~1e-11 level)."""
    cfg, sde, model, tx, state = setup
    batch = jax.random.uniform(jax.random.PRNGKey(1), (8, 9, 9, 1))
    labels = batch[:, 0, 0, :]
    key = jax.random.PRNGKey(4)
    grads = {}
    for remat in ("none", "dots", "full"):
        lf = get_loss_fn(sde, model, train=True, reduce_mean=False,
                         likelihood_weighting=False, remat=remat)
        loss, g = jax.jit(jax.value_and_grad(lf))(
            state.params, batch, labels, key)
        grads[remat] = (float(loss), g)
    for remat in ("dots", "full"):
        assert grads[remat][0] == grads["none"][0]
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-9),
            grads[remat][1], grads["none"][1])


def test_warmup_schedule_scales_updates_cheaply():
    """Warmup algebra on a 1-parameter tree (milliseconds — the core-tier
    stand-in for the slow-tier full-model warmup test): step-0 update is
    scaled by lr*0/warmup = 0, step k by lr*k/warmup."""
    from rdm_tpu.config import ConfigDict

    cfg = ConfigDict.wrap({"optim": {
        "optimizer": "Adam", "lr": 0.5, "beta1": 0.9, "beta2": 0.999,
        "eps": 1e-8, "warmup": 10, "grad_clip": 0.5, "weight_decay": 0}})
    tx = get_optimizer(cfg)
    params = {"w": jnp.ones((3,))}
    opt_state = tx.init(params)
    g = {"w": jnp.full((3,), 0.1)}
    up0, opt_state = tx.update(g, opt_state, params)
    assert float(jnp.abs(up0["w"]).max()) == 0.0        # lr scale 0/10
    up1, opt_state = tx.update(g, opt_state, params)
    up2, _ = tx.update(g, opt_state, params)
    m1 = float(jnp.abs(up1["w"]).max())
    m2 = float(jnp.abs(up2["w"]).max())
    assert m1 > 0.0
    # linear warmup: step-2 update magnitude ~2x step-1 (Adam moments
    # nearly constant under a constant gradient)
    assert 1.5 < m2 / m1 < 2.5
