"""Parallelism: device meshes, DP sharding, vmapped trial packing."""

from dmel_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    replicate,
    initialize_distributed,
)
from dmel_tpu.parallel.trials import (  # noqa: F401
    fit_trials,
    make_multitrial_step,
    make_multitrial_eval,
)
