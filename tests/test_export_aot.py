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


def test_host_stages_survive_export(tmp_path):
    """A sklearn-style pipeline with a string PROLOG (LabelEncoder over a
    string column) and a map/string EPILOG (string-labelled classifier +
    ZipMap) exports and reloads: only the device part is StableHLO, the
    host stages are bundled as serialized mini-graphs (export_aot.py)."""
    import sys

    sys.path.insert(0, "tests")
    from util import make_model, node

    from onnx_rusty_inference_engine_tpu import onnx_io
    from onnx_rusty_inference_engine_tpu.graph import import_model

    ckw = dict(
        nodes_treeids=[0, 0, 0], nodes_nodeids=[0, 1, 2],
        nodes_featureids=[0, 0, 0],
        nodes_modes=["BRANCH_LEQ", "LEAF", "LEAF"],
        nodes_values=[0.5, 0.0, 0.0],
        nodes_truenodeids=[1, 0, 0], nodes_falsenodeids=[2, 0, 0],
        class_treeids=[0, 0, 0, 0], class_nodeids=[1, 1, 2, 2],
        class_ids=[0, 1, 0, 1], class_weights=[0.9, 0.1, 0.2, 0.8],
        classlabels_strings=["no", "yes"], post_transform="NONE")
    nodes = [
        node("LabelEncoder", ["cat"], ["cat_id"], domain="ai.onnx.ml",
             keys_strings=["a", "b"], values_floats=[0.0, 1.0],
             default_float=-1.0),
        node("Unsqueeze", ["cat_id", "ax"], ["feats"]),
        node("TreeEnsembleClassifier", ["feats"], ["label", "scores"],
             domain="ai.onnx.ml", **ckw),
        node("ZipMap", ["scores"], ["probs"], domain="ai.onnx.ml",
             classlabels_strings=["no", "yes"]),
    ]
    cat = np.array(["a", "b", "zz"], dtype=object)
    m = make_model(nodes, {"cat": cat}, ["label", "probs"],
                   initializers={"ax": np.array([1], np.int64)}, opset=13)
    eng = Engine(import_model(onnx_io.parse_model(onnx_io.serialize_model(m))))
    want = eng.run({"cat": cat})

    path = str(tmp_path / "pipe.oriet.npz")
    export_engine(eng, {"cat": cat}, path)
    got = load_exported(path).run({"cat": cat})
    assert [str(v) for v in got["label"]] == \
        [str(v) for v in want["label"]]
    assert got["probs"] == want["probs"]  # list of {label: prob} dicts
    assert "scores" not in got  # helper boundary stripped, like Engine
