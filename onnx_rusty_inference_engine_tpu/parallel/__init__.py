"""Multi-chip / multi-host parallelism (mesh, shardings, collectives).

The reference's only parallelism is intra-process branch threads over a
mutex-guarded value store (reference: src/inference_engine/multithreading/*).
Here, parallelism is the XLA-native kind: a `jax.sharding.Mesh` whose
axes name the strategies — "data" (batch), "model" (tensor), "seq"
(sequence-parallel prefill), "ep" (experts), "pipe" (GPipe pipeline,
pipeline.py); activations and weights carry NamedShardings and XLA/Shardy
inserts all-gather / reduce-scatter / ppermute collectives over ICI
(intra-slice) and DCN (multi-host), overlapped with compute.
"""

from .mesh import make_mesh, initialize_distributed, local_mesh  # noqa: F401
from .pipeline import (  # noqa: F401
    PipelineError,
    PipelinedDecoder,
    infer_boundaries,
    split_stages,
)
from .sharding import (  # noqa: F401
    data_input_sharding,
    cnn_param_sharding,
    replicated,
    seq_input_sharding,
    shard_params,
)
