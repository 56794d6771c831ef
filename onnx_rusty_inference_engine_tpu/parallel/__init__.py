"""Multi-chip / multi-host parallelism (mesh, shardings, collectives).

The reference's only parallelism is intra-process branch threads over a
mutex-guarded value store (reference: src/inference_engine/multithreading/*).
Here, parallelism is the XLA-native kind: a `jax.sharding.Mesh` with
("data", "model") axes; activations data-sharded, weights tensor-sharded;
XLA/Shardy inserts all-gather / reduce-scatter collectives over ICI
(intra-slice) and DCN (multi-host) and overlaps them with compute.
"""

from .mesh import make_mesh, initialize_distributed, local_mesh  # noqa: F401
from .sharding import (  # noqa: F401
    data_input_sharding,
    cnn_param_sharding,
    replicated,
    shard_params,
)
