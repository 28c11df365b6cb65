"""Device-mesh scale-out utilities."""

from marl_dmfb_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    BATCH_AXIS,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "BATCH_AXIS"]
