"""Multi-chip sharding tests on the 8-virtual-device CPU mesh — same pjit
code path as a real TPU slice (SURVEY.md §4 implication (d))."""

import numpy as np
import pytest

import jax
import onnx_rusty_inference_engine_tpu as oriet
from onnx_rusty_inference_engine_tpu.parallel import (
    cnn_param_sharding,
    data_input_sharding,
    make_mesh,
)

rng = np.random.default_rng(11)


def test_make_mesh_axes():
    mesh = make_mesh({"data": 4, "model": 2})
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)


def test_sharded_mnist_matches_single_device():
    graph = oriet.import_onnx("/root/reference/models/mnist-8.onnx")
    x = (rng.standard_normal((8, 1, 28, 28)) * 10).astype(np.float32)

    single = oriet.Engine(graph)
    want = np.asarray(single({"Input3": x})["Plus214_Output_0"])

    mesh = make_mesh({"data": 4, "model": 2})
    sharded = oriet.Engine(
        graph,
        mesh=mesh,
        param_sharding_fn=cnn_param_sharding(mesh),
        input_sharding_fn=data_input_sharding(mesh),
    )
    with mesh:
        got = np.asarray(sharded({"Input3": x})["Plus214_Output_0"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sharded_int8_squeezenet_runs():
    from onnx_rusty_inference_engine_tpu.models import build_squeezenet
    from onnx_rusty_inference_engine_tpu.quant import quantize_graph

    graph = oriet.import_model(build_squeezenet())
    x = rng.random((8, 3, 64, 64), np.float32)
    qgraph = quantize_graph(graph, calibration_inputs=[{"data_0": x}])

    mesh = make_mesh({"data": 2, "model": 4})
    eng = oriet.Engine(
        qgraph,
        mesh=mesh,
        param_sharding_fn=cnn_param_sharding(mesh),
        input_sharding_fn=data_input_sharding(mesh),
    )
    single = oriet.Engine(qgraph)
    with mesh:
        got = np.asarray(next(iter(eng({"data_0": x}).values())))
    want = np.asarray(next(iter(single({"data_0": x}).values())))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_weights_actually_sharded():
    """Tensor parallelism is real: conv kernels split over the model axis."""
    from onnx_rusty_inference_engine_tpu.models import build_squeezenet

    graph = oriet.import_model(build_squeezenet())
    mesh = make_mesh({"data": 1, "model": 8})
    eng = oriet.Engine(graph, mesh=mesh,
                       param_sharding_fn=cnn_param_sharding(mesh))
    w = eng.params["conv1_w_0_1" if "conv1_w_0_1" in eng.params
                   else "conv1_w_0"]  # 96x3x7x7
    assert len(w.sharding.device_set) == 8
    shard_shape = w.sharding.shard_shape(w.shape)
    assert shard_shape[0] == w.shape[0] // 8  # O-dim split


def test_dryrun_multichip_entry():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__

    fn, (params, inputs) = __graft_entry__.entry()
    shapes = jax.eval_shape(fn, params, inputs)
    (out,) = shapes.values()
    assert out.shape[1] == 1000


def test_seq_parallel_prefill_matches_replicated():
    """Sequence parallelism (sp): prefill with the L axis sharded over
    "seq" (composed with batch over "data") matches the replicated run —
    XLA inserts the attention all-gathers; MLP/layernorm stay L-sharded."""
    from onnx_rusty_inference_engine_tpu.graph import import_model
    from onnx_rusty_inference_engine_tpu.models.gpt2 import (
        GPT2Config, build_gpt2)
    from onnx_rusty_inference_engine_tpu.parallel import (
        replicated, seq_input_sharding)

    cfg = GPT2Config(vocab_size=128, n_positions=32, n_embd=48, n_layer=2,
                     n_head=4)
    graph = import_model(build_gpt2(cfg, batch=4, seq_len=16,
                                    with_presents=False))
    ids = rng.integers(0, 128, (4, 16)).astype(np.int64)

    want = np.asarray(oriet.Engine(graph)({"input_ids": ids})["logits"])

    mesh = make_mesh({"data": 2, "seq": 4})
    eng = oriet.Engine(
        graph,
        mesh=mesh,
        param_sharding_fn=lambda name, arr: replicated(mesh),
        input_sharding_fn=seq_input_sharding(mesh),
    )
    with mesh:
        got = np.asarray(eng({"input_ids": ids})["logits"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
