"""Multi-process (multi-host) DP test (VERDICT round-1 item 6).

Round 1 exercised SPMD correctness on a single-process 8-device mesh but
never executed the ``jax.process_count() > 1`` branches
(``parallel/mesh.py:shard_host_batch``'s
``host_local_array_to_global_array`` path and the per-process data
sharding).  Here a 2-process x 4-virtual-device JAX distributed job runs
2 train steps with each process feeding its half of the batch; the
resulting parameters must match a single-process 8-device run fed the
full batches.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_matches_single_process(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(_HERE, "mp_worker.py"),
         str(port), str(i), "2", str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    assert all(p.returncode == 0 for p in procs), \
        f"worker failed:\n{outs[0]}\n---\n{outs[1]}"
    mp = np.load(tmp_path / "mp_result.npz")

    # single-process reference on the in-process 8-device mesh
    import jax
    import jax.numpy as jnp

    from rdm_tpu.config import load_config
    from rdm_tpu.models import NCSNpp
    from rdm_tpu.parallel import jit_train_step, make_mesh, shard_host_batch
    from rdm_tpu.sde import RVESDE
    from rdm_tpu.training import (get_optimizer, init_train_state,
                                  make_train_step)

    cfg = load_config("train", overrides=[
        "model.nf=16", "model.ch_mult=[1,2]", "model.num_res_blocks=1",
        "model.dropout=0.0", "optim.warmup=1"])
    sde = RVESDE(cfg.sde.sigma_min, cfg.sde.sigma_max, cfg.sde.num_scales)
    model = NCSNpp(nf=16, ch_mult=(1, 2), num_res_blocks=1, dropout=0.0)
    tx = get_optimizer(cfg)
    state = init_train_state(model, tx, cfg, rng=jax.random.PRNGKey(0))
    mesh = make_mesh()
    step = jit_train_step(make_train_step(sde, model, tx), mesh)
    losses = []
    for i in range(2):
        batch = np.random.default_rng(100 + i).uniform(
            0.05, 0.95, (32, 9, 9, 1)).astype(np.float32)
        labels = batch[:, 0, 0, :]
        gb, gl = shard_host_batch(mesh, (jnp.asarray(batch),
                                         jnp.asarray(labels)))
        state, loss = step(state, gb, gl, jax.random.PRNGKey(7 + i))
        losses.append(float(loss))

    np.testing.assert_allclose(mp["losses"], losses, rtol=1e-4)
    flat = jax.tree.leaves(jax.device_get(state.params))
    assert len(flat) == len([k for k in mp.files if k.startswith("p")])
    for i, leaf in enumerate(flat):
        np.testing.assert_allclose(mp[f"p{i}"], np.asarray(leaf),
                                   rtol=2e-4, atol=1e-6)


def test_per_process_data_shards_partition_dataset():
    """``get_dataset``'s per-process interleaved shards are disjoint and
    jointly cover the dataset each epoch (the DistributedSampler
    contract, reference ``datasets.py:170-172``)."""
    from rdm_tpu.data.datasets import _epoch_iterator

    images = np.arange(40, dtype=np.float32).reshape(40, 1)
    labels = np.arange(40, dtype=np.float32).reshape(40, 1)
    seen = []
    for proc in range(2):
        it = _epoch_iterator(images, labels, batch=4, seed=3,
                             shard=(2, proc))
        got = np.concatenate([next(it)[0] for _ in range(5)]).ravel()
        seen.append(set(got.astype(int).tolist()))
    assert seen[0].isdisjoint(seen[1])
    assert seen[0] | seen[1] == set(range(40))
