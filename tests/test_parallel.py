"""Data-parallel tests on the 8-device virtual CPU mesh — the sharding
story the reference never had (its DDP path was only exercised by running
it; SURVEY.md section 4.5)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rdm_tpu.config import load_config
from rdm_tpu.models import NCSNpp
from rdm_tpu.parallel import (batch_sharding, jit_eval_step, jit_train_step,
                              make_mesh, replicated, shard_host_batch)
from rdm_tpu.sde import RVESDE
from rdm_tpu.training import get_optimizer, init_train_state, make_eval_step, make_train_step


@pytest.fixture(scope="module")
def world():
    cfg = load_config("train", overrides=[
        "model.nf=16", "model.ch_mult=[1,2]", "model.num_res_blocks=1",
        "model.dropout=0.0", "optim.warmup=1"])
    sde = RVESDE(cfg.sde.sigma_min, cfg.sde.sigma_max, cfg.sde.num_scales)
    model = NCSNpp(nf=16, ch_mult=(1, 2), num_res_blocks=1, dropout=0.0)
    tx = get_optimizer(cfg)
    state = init_train_state(model, tx, cfg, rng=jax.random.PRNGKey(0))
    mesh = make_mesh()
    return cfg, sde, model, tx, state, mesh


def test_mesh_has_8_devices(world):
    *_, mesh = world
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_dp_train_step_shards_batch(world):
    cfg, sde, model, tx, state, mesh = world
    step = jit_train_step(make_train_step(sde, model, tx), mesh)
    batch = np.random.default_rng(0).uniform(0.05, 0.95, (32, 9, 9, 1)).astype(np.float32)
    labels = batch[:, 0, 0, :]
    gbatch, glabels = shard_host_batch(mesh, (jnp.asarray(batch), jnp.asarray(labels)))
    assert gbatch.sharding.is_equivalent_to(batch_sharding(mesh), gbatch.ndim)
    new_state, loss = step(state, gbatch, glabels, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # params stay replicated
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.sharding.is_equivalent_to(replicated(mesh), leaf.ndim)


@pytest.mark.slow
def test_dp_matches_single_device(world):
    """The DP-sharded step computes the SAME update as the unsharded step
    (gradient all-reduce correctness)."""
    cfg, sde, model, tx, state, mesh = world
    from rdm_tpu.training import make_train_step as mts
    step_sharded = jit_train_step(mts(sde, model, tx), mesh)
    step_plain = jax.jit(mts(sde, model, tx))

    batch = jnp.asarray(np.random.default_rng(1).uniform(0.1, 0.9, (16, 9, 9, 1)), jnp.float32)
    labels = batch[:, 0, 0, :]
    key = jax.random.PRNGKey(7)

    gb, gl = shard_host_batch(mesh, (batch, labels))
    s_shard, loss_shard = step_sharded(state, gb, gl, key)
    s_plain, loss_plain = step_plain(state, batch, labels, key)

    np.testing.assert_allclose(float(loss_shard), float(loss_plain), rtol=2e-5)
    a = jax.tree.leaves(s_shard.params)
    b = jax.tree.leaves(s_plain.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-6)


def test_eval_step_sharded(world):
    cfg, sde, model, tx, state, mesh = world
    ev = jit_eval_step(make_eval_step(sde, model), mesh)
    batch = jnp.asarray(np.random.default_rng(2).uniform(0.1, 0.9, (16, 9, 9, 1)), jnp.float32)
    labels = batch[:, 0, 0, :]
    gb, gl = shard_host_batch(mesh, (batch, labels))
    loss = ev(state, gb, gl, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_sharded_sampling(world):
    """Mass sampling with the batch sharded over the mesh — the throughput
    path for the 10k-traj/min target."""
    cfg, sde, model, tx, state, mesh = world
    from rdm_tpu.sampling import get_pc_sampler
    from rdm_tpu.models.registry import get_cf_score_fn

    small_sde = RVESDE(0.01, 5.0, N=20)
    shape = (16, 9, 9, 1)
    sampler = get_pc_sampler(small_sde, shape, eps=1e-5)
    labels = jnp.zeros((16, 1))
    weight = jnp.zeros((16,))

    def run(params, key):
        score_fn = get_cf_score_fn(small_sde, model, params, labels, weight)
        return sampler(score_fn, key)[0]

    f = jax.jit(run, in_shardings=(replicated(mesh), None),
                out_shardings=batch_sharding(mesh))
    x = f(state.params, jax.random.PRNGKey(0))
    assert x.shape == shape
    x = np.asarray(x)
    assert (x >= 0).all() and (x <= 1).all()


@pytest.mark.slow
def test_on_device_data_step_matches_host_batch(world):
    """The on-device-gather train step computes the same update as the
    host-batch step for the same minibatch."""
    cfg, sde, model, tx, state, mesh = world
    from rdm_tpu.parallel import jit_train_step_on_device
    from rdm_tpu.training import make_train_step
    from rdm_tpu.training.losses import make_train_step_on_device

    rng = np.random.default_rng(5)
    images = jnp.asarray(rng.uniform(0.1, 0.9, (64, 9, 9, 1)), jnp.float32)
    labels = jnp.asarray(images[:, 0, 0, :])
    idx = jnp.asarray(rng.permutation(64)[:16].astype(np.int32))

    dev_step = jit_train_step_on_device(
        make_train_step_on_device(sde, model, tx, use_labels=True), mesh,
        with_idx=True)
    host_step = jax.jit(make_train_step(sde, model, tx))

    key = jax.random.PRNGKey(9)
    d_imgs = jax.device_put(images, replicated(mesh))
    d_lbls = jax.device_put(labels, replicated(mesh))
    s_dev, loss_dev = dev_step(state, d_imgs, d_lbls, idx, key)
    s_host, loss_host = host_step(state, images[idx], labels[idx], key)

    np.testing.assert_allclose(float(loss_dev), float(loss_host), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(s_dev.params), jax.tree.leaves(s_host.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_sharded_sampler_matches_unsharded(world):
    """Batch-sharded mass sampling is bit-identical to the single-device
    program (SPMD must not change the math)."""
    cfg, sde, model, tx, state, mesh = world
    from rdm_tpu.sampling import get_pc_sampler
    from rdm_tpu.models.registry import get_cf_score_fn

    small_sde = RVESDE(0.01, 5.0, N=12)
    shape = (16, 9, 9, 1)
    sampler = get_pc_sampler(small_sde, shape, eps=1e-5)
    labels = jnp.zeros((16, 1))
    weight = jnp.zeros((16,))

    def run(params, key):
        score_fn = get_cf_score_fn(small_sde, model, params, labels, weight)
        return sampler(score_fn, key)[0]

    shard = jax.jit(run, in_shardings=(replicated(mesh), None),
                    out_shardings=batch_sharding(mesh))
    plain = jax.jit(run)
    a = np.asarray(shard(state.params, jax.random.PRNGKey(3)))
    b = np.asarray(plain(state.params, jax.random.PRNGKey(3)))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
