"""Worker for the two-process jax.distributed test (test_distributed.py).

Run as:  python distributed_worker.py <coordinator> <num_procs> <proc_id>

Forces the CPU backend BEFORE any computation (the axon sitecustomize pins
jax_platforms at interpreter start; the env var alone is too late), brings
up the real jax.distributed DCN path with a localhost coordinator, builds a
2-process global mesh, runs the sharded MNIST forward, and checks this
process's LOCAL SHARD against a locally computed single-device reference.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    coordinator, num_procs, proc_id = (sys.argv[1], int(sys.argv[2]),
                                       int(sys.argv[3]))
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from onnx_rusty_inference_engine_tpu.parallel.mesh import (
        initialize_distributed, make_mesh)

    initialize_distributed(coordinator_address=coordinator,
                           num_processes=num_procs, process_id=proc_id)
    assert jax.process_count() == num_procs, jax.process_count()
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == num_procs * n_local

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from onnx_rusty_inference_engine_tpu.engine import lower
    from onnx_rusty_inference_engine_tpu.graph import import_onnx

    graph = import_onnx("/root/reference/models/mnist-8.onnx")
    fn = jax.jit(lower(graph))
    params_np = {k: np.asarray(graph.constants[k])
                 for k in graph.weight_names}

    mesh = make_mesh({"data": n_global})
    batch = 2 * n_global
    rng = np.random.default_rng(0)  # same seed everywhere: global batch
    x = (rng.standard_normal((batch, 1, 28, 28)) * 12).astype(np.float32)

    # global sharded input: each process contributes its local rows
    x_sharding = NamedSharding(mesh, P("data"))
    xg = jax.make_array_from_callback(x.shape, x_sharding,
                                      lambda idx: x[idx])
    params = {
        k: jax.make_array_from_callback(
            v.shape, NamedSharding(mesh, P()), lambda idx, v=v: v[idx])
        for k, v in params_np.items()
    }

    with mesh:
        out = fn(params, {graph.input_names[0]: xg})
    (y,) = out.values()
    jax.block_until_ready(y)

    # single-device local reference over the full batch
    ref_out = jax.jit(lower(graph))(
        {k: jnp.asarray(v) for k, v in params_np.items()},
        {graph.input_names[0]: jnp.asarray(x)})
    (ref,) = ref_out.values()

    for shard in y.addressable_shards:
        rows = shard.index[0]
        np.testing.assert_allclose(np.asarray(shard.data),
                                   np.asarray(ref)[rows],
                                   rtol=1e-5, atol=1e-5)
    print(f"DISTRIBUTED_OK proc={proc_id} global_devices={n_global} "
          f"local={n_local}", flush=True)


if __name__ == "__main__":
    main()
