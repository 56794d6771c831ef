"""Worker for the multi-host SERVING tests (test_distributed.py).

Run as:  python distributed_serve_worker.py <coordinator> <n> <i> <mode>

mode "decode": a DecodeServer steps on a 2-process global {model: G}
mesh — tensor-sharded weights, per-step XLA collectives over the DCN
path — with MORE requests than slots so admission happens while
stepping. SPMD determinism comes from autostart=False: every process
pre-queues identical requests, so both dispatchers admit them in
identical order and enter identical global computations. Served tokens
must equal a process-local single-device server's.

mode "cnn": the same recipe for the CNN InferenceServer (batched
dispatch of single-example submissions over a sharded MNIST engine).

mode "decode_dm": the 4-process variant on a {data: 2, model: G/2} mesh
— the model groups span processes, so per-step collectives cross the
process boundary in BOTH axes' layouts (VERDICT r4 #8).

mode "fail": failure injection — process 1 (a non-coordinator) kills
itself mid-serve after the decode loop has demonstrably stepped; the
survivors' next collective either raises or blocks, and the opt-in
step_timeout watchdog must fail every pending future with a clean
RuntimeError instead of hanging the clients (SURVEY §5 failure
detection, VERDICT r4 #8).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    coordinator, num_procs, proc_id, mode = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from onnx_rusty_inference_engine_tpu.parallel.mesh import (
        initialize_distributed, make_mesh)
    from onnx_rusty_inference_engine_tpu.parallel.sharding import (
        cnn_param_sharding)

    initialize_distributed(coordinator_address=coordinator,
                           num_processes=num_procs, process_id=proc_id)
    n_global = len(jax.devices())
    assert jax.process_count() == num_procs
    mesh = make_mesh({"model": n_global})

    if mode == "decode_dm":
        # re-shape the mesh: model groups of G/2 devices span processes,
        # data groups pair the remaining axis (4 procs x 2 local = 8)
        mesh = make_mesh({"data": 2, "model": n_global // 2})
        mode = "decode"

    if mode == "fail":
        from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY
        from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer

        rng = np.random.default_rng(7)
        reqs = [(rng.integers(0, TINY.vocab_size, (4,)).astype(np.int64), 64)
                for _ in range(3)]
        srv = DecodeServer(TINY, mesh=mesh,
                           param_sharding_fn=cnn_param_sharding(mesh),
                           autostart=False, slots=2, prompt_len=4,
                           max_len=96)
        seen = []

        def _on_tok(_t):
            # die only after the decode graph has compiled AND stepped:
            # token 1 is the admission prefill's, 3+ proves decode steps
            seen.append(1)
            if proc_id == 1 and len(seen) >= 3:
                import os as _os
                _os._exit(3)

        # small enough to beat jax's coordination-service fatal-error
        # propagation (it hard-kills tasks ~10s+ after a peer death);
        # a premature fire still exercises the exact no-hang contract
        srv.step_timeout = 6.0
        futs = [srv.submit(p, n, on_token=_on_tok) for p, n in reqs]
        srv.start()
        import concurrent.futures as _cf

        failed = 0
        for f in futs:
            try:
                f.result(timeout=420)
            except _cf.TimeoutError:
                raise AssertionError("future HUNG despite peer death")
            except Exception:
                # the watchdog's RuntimeError (collective blocked), or
                # whatever gloo raises on peer reset — any exception is a
                # clean failure; only a hang is a bug
                failed += 1
        assert failed == len(futs), (
            f"only {failed}/{len(futs)} futures failed cleanly")
        print(f"SERVE_FAIL_OK proc={proc_id} global_devices={n_global}",
              flush=True)
        import os as _os
        import time as _time
        if proc_id == 0:
            _time.sleep(5)         # coordinator exits LAST: its death
                                   # fatally tears down the other tasks
        _os._exit(0)               # dispatcher may be wedged in gloo; don't
                                   # wait on runtime threads at exit

    if mode == "decode":
        from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY
        from onnx_rusty_inference_engine_tpu.serve_llm import DecodeServer

        rng = np.random.default_rng(5)
        reqs = [(rng.integers(0, TINY.vocab_size, (4,)).astype(np.int64),
                 int(rng.integers(3, 7))) for _ in range(4)]

        kw = dict(slots=2, prompt_len=4, max_len=24)
        srv = DecodeServer(TINY, mesh=mesh,
                           param_sharding_fn=cnn_param_sharding(mesh),
                           autostart=False, **kw)
        futs = [srv.submit(p, n) for p, n in reqs]   # pre-queue, THEN run
        srv.start()
        got = [f.result(timeout=600) for f in futs]
        srv.stop()

        ref_srv = DecodeServer(TINY, **kw)           # process-local
        ref = [ref_srv.submit(p, n).result(timeout=600) for p, n in reqs]
        ref_srv.stop()
        assert got == ref, (got, ref)
        assert [len(g) for g in got] == [n for _, n in reqs]
        print(f"SERVE_DECODE_OK proc={proc_id} global_devices={n_global}",
              flush=True)
        return

    assert mode == "cnn"
    from onnx_rusty_inference_engine_tpu.engine import Engine
    from onnx_rusty_inference_engine_tpu.graph import import_onnx
    from onnx_rusty_inference_engine_tpu.serve import InferenceServer

    graph = import_onnx("/root/reference/models/mnist-8.onnx")
    eng = Engine(graph, mesh=mesh,
                 param_sharding_fn=cnn_param_sharding(mesh))
    srv = InferenceServer(eng, batch_buckets=(4,), autostart=False)
    rng = np.random.default_rng(3)
    xs = [(rng.standard_normal((1, 1, 28, 28)) * 10).astype(np.float32)
          for _ in range(4)]
    futs = [srv.submit(x) for x in xs]
    srv.start()
    outs = [np.asarray(next(iter(f.result(timeout=600).values())))
            for f in futs]
    srv.stop()

    local = Engine(graph)                            # process-local ref
    for x, got in zip(xs, outs):
        want = np.asarray(next(iter(local(
            {graph.input_names[0]: x}).values())))
        np.testing.assert_allclose(got, want[0] if got.ndim < want.ndim
                                   else want, rtol=1e-4, atol=1e-4)
    print(f"SERVE_CNN_OK proc={proc_id} global_devices={n_global}",
          flush=True)


if __name__ == "__main__":
    main()
