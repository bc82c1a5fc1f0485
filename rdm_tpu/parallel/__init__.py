from .mesh import (make_mesh, batch_sharding, replicated,  # noqa: F401
                   jit_train_step, jit_train_step_on_device, jit_eval_step,
                   shard_host_batch)
