"""Worker for the multi-process DP test (run via subprocess by
``test_multiprocess.py``; NOT collected by pytest).

Each process owns 4 virtual CPU devices and joins a 2-process JAX
distributed job: global mesh = 8 devices.  Runs 2 deterministic train
steps where each process feeds only ITS contiguous half of the global
batch through ``shard_host_batch`` (the
``host_local_array_to_global_array`` path that only executes when
``jax.process_count() > 1``), then process 0 writes the resulting params
and losses for the parent to compare against a single-process run.
"""
import os
import sys


def main():
    port, proc_id, n_proc, outdir = sys.argv[1:5]
    proc_id, n_proc = int(proc_id), int(n_proc)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # each subprocess compiles its own tiny graphs; don't poison the
    # shared persistent cache with mesh-shape-specific entries
    os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.join(outdir, "xcache")

    import jax
    # the environment's sitecustomize pre-imports jax pinned to the TPU
    # plugin; env vars are too late — override the config value (backends
    # are still uninitialised here), same as tests/conftest.py
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=n_proc, process_id=proc_id)
    assert jax.process_count() == n_proc
    assert jax.local_device_count() == 4
    assert len(jax.devices()) == 4 * n_proc

    import jax.numpy as jnp
    import numpy as np

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
    assert mesh.devices.size == 4 * n_proc

    step = jit_train_step(make_train_step(sde, model, tx), mesh)
    losses = []
    B = 32
    for i in range(2):
        batch = np.random.default_rng(100 + i).uniform(
            0.05, 0.95, (B, 9, 9, 1)).astype(np.float32)
        labels = batch[:, 0, 0, :]
        # this process's contiguous half: process p's local devices are
        # mesh slots [p*4, (p+1)*4) (jax device ids are process-major)
        lo, hi = proc_id * B // n_proc, (proc_id + 1) * B // n_proc
        gb, gl = shard_host_batch(
            mesh, (jnp.asarray(batch[lo:hi]), jnp.asarray(labels[lo:hi])))
        assert gb.shape[0] == B  # global batch reassembled
        state, loss = step(state, gb, gl, jax.random.PRNGKey(7 + i))
        losses.append(float(loss))

    if proc_id == 0:
        flat = jax.tree.leaves(jax.device_get(
            jax.tree.map(lambda a: np.asarray(a), state.params)))
        np.savez(os.path.join(outdir, "mp_result.npz"),
                 losses=np.asarray(losses),
                 **{f"p{i}": leaf for i, leaf in enumerate(flat)})
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
