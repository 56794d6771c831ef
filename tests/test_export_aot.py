"""AOT export (export_aot.py): compiled program + weights as one artifact.

The reference re-parses its .onnx and re-walks nodes every start
(src/main.rs:26-43); here the deployment artifact is serialized StableHLO
(jax.export) + params — loading needs no ONNX importer, no op registry,
no tracing, and must reproduce the Engine bit-for-bit.
"""

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.export_aot import (
    ExportedModel,
    export_engine,
    export_graph,
    load_exported,
)
from onnx_rusty_inference_engine_tpu.graph import import_onnx

MNIST = "/root/reference/models/mnist-8.onnx"


def _feed(graph, seed=0):
    x = np.random.default_rng(seed).standard_normal(
        (1, 1, 28, 28)).astype(np.float32)
    return {graph.input_names[0]: x}


def test_roundtrip_exact(tmp_path):
    g = import_onnx(MNIST)
    eng = Engine(g)
    feed = _feed(g)
    want = {k: np.asarray(v) for k, v in eng(feed).items()}

    path = str(tmp_path / "m.oriet.npz")
    export_engine(eng, feed, path)
    m = load_exported(path)
    got = m.run(feed)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])


def test_roundtrip_int8_quantized(tmp_path):
    """The quantize-once-deploy-artifact story: int8 weights (and the whole
    QDQ program) freeze into the artifact and reproduce exactly."""
    from onnx_rusty_inference_engine_tpu.quant import quantize_graph

    g = import_onnx(MNIST)
    feed = _feed(g)
    q = quantize_graph(g, calibration_inputs=[feed])
    eng = Engine(q)
    want = {k: np.asarray(v) for k, v in eng(feed).items()}

    path = str(tmp_path / "q.oriet.npz")
    export_engine(eng, feed, path)
    got = load_exported(path).run(feed)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])


def test_roundtrip_bfloat16(tmp_path):
    """bf16 params ride a uint16 view through the npz container."""
    import jax.numpy as jnp

    g = import_onnx(MNIST)
    eng = Engine(g, dtype="bfloat16")
    feed = _feed(g)
    want = {k: np.asarray(v) for k, v in eng(feed).items()}

    path = str(tmp_path / "b.oriet.npz")
    export_engine(eng, feed, path)
    m = load_exported(path)
    assert any(v.dtype == jnp.bfloat16 for v in m.params.values())
    got = m.run(feed)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])


def test_dual_platform_artifact(tmp_path):
    """platforms=["cpu", "tpu"] bakes both lowerings into one artifact
    (serve the chip + a CPU fallback host) and still runs here."""
    g = import_onnx(MNIST)
    feed = _feed(g)
    path = str(tmp_path / "d.oriet.npz")
    export_graph(g, feed, path, platforms=["cpu", "tpu"])
    m = load_exported(path)
    assert m.platforms == ["cpu", "tpu"]
    out = m.run(feed)
    assert out[g.outputs[0]].shape == (1, 10)


def test_missing_input_raises(tmp_path):
    g = import_onnx(MNIST)
    feed = _feed(g)
    path = str(tmp_path / "m.oriet.npz")
    export_graph(g, feed, path)
    m = load_exported(path)
    with pytest.raises(ValueError, match="missing inputs"):
        m({})


def test_bad_artifact_raises(tmp_path):
    path = str(tmp_path / "junk.npz")
    np.savez(path, __meta__=np.frombuffer(b'{"format": "nope"}',
                                          dtype=np.uint8))
    with pytest.raises(ValueError, match="not an oriet AOT artifact"):
        load_exported(path)


def test_cli_export_then_run_exported_golden(tmp_path, capsys):
    """oriet export → oriet run-exported --golden must MATCH the reference
    golden pair without touching the ONNX importer at run time."""
    from onnx_rusty_inference_engine_tpu.cli import main

    art = str(tmp_path / "mnist.oriet.npz")
    rc = main(["export", "--model", MNIST, "--out", art,
               "--input", "/root/reference/mnist_data_0.pb"])
    assert rc == 0
    rc = main(["run-exported", "--artifact", art,
               "--input", "/root/reference/mnist_data_0.pb",
               "--golden", "/root/reference/mnist_output_0.pb"])
    assert rc == 0
    assert "MATCH" in capsys.readouterr().out


def test_meta_describes_interface(tmp_path):
    g = import_onnx(MNIST)
    feed = _feed(g)
    path = str(tmp_path / "m.oriet.npz")
    export_graph(g, feed, path)
    m = load_exported(path)
    (name,) = m.input_specs
    assert m.input_specs[name]["shape"] == [1, 1, 28, 28]
    assert m.input_specs[name]["dtype"] == "float32"
    assert m.outputs == list(g.outputs)
    assert isinstance(m, ExportedModel)


def test_sharded_engine_exports_and_reloads():
    """An Engine compiled over a mesh exports with its shardings baked in
    (meta records nr_devices); the loaded artifact re-places args across
    that many local devices and reproduces the sharded run."""
    from onnx_rusty_inference_engine_tpu.parallel import (
        cnn_param_sharding,
        data_input_sharding,
        make_mesh,
    )

    g = import_onnx(MNIST)
    mesh = make_mesh({"data": 4, "model": 2})
    eng = Engine(g, mesh=mesh, param_sharding_fn=cnn_param_sharding(mesh),
                 input_sharding_fn=data_input_sharding(mesh))
    x = np.random.default_rng(0).standard_normal(
        (8, 1, 28, 28)).astype(np.float32)
    feed = {g.input_names[0]: x}
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "s.oriet.npz")
        with mesh:
            want = {k: np.asarray(v) for k, v in eng(feed).items()}
            export_engine(eng, feed, path)
        m = load_exported(path)
        assert m.nr_devices == 8
        got = m.run(feed)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, atol=1e-5)
