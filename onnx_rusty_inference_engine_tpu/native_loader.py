"""ctypes bridge to the native C++ ONNX parser (native/onnx_loader.cc).

Used by onnx_io-compatible `load_model_native()`; the engine prefers it when
the shared library is present (built on demand via make) and falls back to
the pure-Python wire codec transparently. Disable with ORIET_NATIVE=0.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Union

import numpy as np

from . import onnx_io

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SO = os.path.join(_DIR, "libonnx_loader.so")
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if os.environ.get("ORIET_NATIVE", "1") == "0":
        return None
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    c_char_p, c_void_p, c_size_t = ctypes.c_char_p, ctypes.c_void_p, ctypes.c_size_t
    sig = {
        "oriet_parse_model": (c_void_p, [ctypes.c_char_p, c_size_t]),
        "oriet_free_model": (None, [c_void_p]),
        "oriet_error": (c_char_p, [c_void_p]),
        "oriet_ir_version": (ctypes.c_int64, [c_void_p]),
        "oriet_opset": (ctypes.c_int64, [c_void_p]),
        "oriet_num_opset_imports": (c_size_t, [c_void_p]),
        "oriet_opset_import_domain": (c_char_p, [c_void_p, c_size_t]),
        "oriet_opset_import_version": (ctypes.c_int64, [c_void_p, c_size_t]),
        "oriet_model_version": (ctypes.c_int64, [c_void_p]),
        "oriet_producer": (c_char_p, [c_void_p]),
        "oriet_producer_version": (c_char_p, [c_void_p]),
        "oriet_domain": (c_char_p, [c_void_p]),
        "oriet_graph_name": (c_char_p, [c_void_p]),
        "oriet_num_nodes": (c_size_t, [c_void_p]),
        "oriet_node_op": (c_char_p, [c_void_p, c_size_t]),
        "oriet_node_name": (c_char_p, [c_void_p, c_size_t]),
        "oriet_node_domain": (c_char_p, [c_void_p, c_size_t]),
        "oriet_node_num_inputs": (c_size_t, [c_void_p, c_size_t]),
        "oriet_node_input": (c_char_p, [c_void_p, c_size_t, c_size_t]),
        "oriet_node_num_outputs": (c_size_t, [c_void_p, c_size_t]),
        "oriet_node_output": (c_char_p, [c_void_p, c_size_t, c_size_t]),
        "oriet_node_num_attrs": (c_size_t, [c_void_p, c_size_t]),
        "oriet_node_attr_name": (c_char_p, [c_void_p, c_size_t, c_size_t]),
        "oriet_node_attr_raw": (ctypes.POINTER(ctypes.c_uint8),
                                [c_void_p, c_size_t, c_size_t,
                                 ctypes.POINTER(c_size_t)]),
        "oriet_num_initializers": (c_size_t, [c_void_p]),
        "oriet_init_name": (c_char_p, [c_void_p, c_size_t]),
        "oriet_init_dtype": (ctypes.c_int32, [c_void_p, c_size_t]),
        "oriet_init_ndim": (c_size_t, [c_void_p, c_size_t]),
        "oriet_init_dims": (ctypes.POINTER(ctypes.c_int64), [c_void_p, c_size_t]),
        "oriet_init_data": (ctypes.POINTER(ctypes.c_uint8),
                            [c_void_p, c_size_t, ctypes.POINTER(c_size_t)]),
        "oriet_num_vi": (c_size_t, [c_void_p, ctypes.c_int]),
        "oriet_vi_name": (c_char_p, [c_void_p, ctypes.c_int, c_size_t]),
        "oriet_vi_elem_type": (ctypes.c_int32, [c_void_p, ctypes.c_int, c_size_t]),
        "oriet_vi_ndim": (c_size_t, [c_void_p, ctypes.c_int, c_size_t]),
        "oriet_vi_dims": (ctypes.POINTER(ctypes.c_int64),
                          [c_void_p, ctypes.c_int, c_size_t]),
        "oriet_vi_dim_param": (c_char_p, [c_void_p, ctypes.c_int, c_size_t,
                                          c_size_t]),
        "oriet_parse_tensor": (c_void_p, [ctypes.c_char_p, c_size_t]),
        "oriet_free_tensor": (None, [c_void_p]),
        "oriet_tensor_name": (c_char_p, [c_void_p]),
        "oriet_tensor_dtype": (ctypes.c_int32, [c_void_p]),
        "oriet_tensor_ndim": (c_size_t, [c_void_p]),
        "oriet_tensor_dims": (ctypes.POINTER(ctypes.c_int64), [c_void_p]),
        "oriet_tensor_data": (ctypes.POINTER(ctypes.c_uint8),
                              [c_void_p, ctypes.POINTER(c_size_t)]),
    }
    for name, (restype, argtypes) in sig.items():
        fn = getattr(lib, name)
        fn.restype = restype
        fn.argtypes = argtypes
    _lib = lib
    return _lib


def _vi_list(lib, h, kind: int) -> List[onnx_io.ValueInfo]:
    out = []
    for i in range(lib.oriet_num_vi(h, kind)):
        ndim = lib.oriet_vi_ndim(h, kind, i)
        dims_ptr = lib.oriet_vi_dims(h, kind, i)
        shape: List[Union[int, str, None]] = []
        for j in range(ndim):
            d = dims_ptr[j]
            if d >= 0:
                shape.append(int(d))
            else:
                p = lib.oriet_vi_dim_param(h, kind, i, j)
                shape.append(p.decode() if p else None)
        out.append(onnx_io.ValueInfo(
            name=lib.oriet_vi_name(h, kind, i).decode(),
            elem_type=int(lib.oriet_vi_elem_type(h, kind, i)) or None,
            shape=shape if ndim else None,
        ))
    return out


def read_tensor_native(path: str) -> Optional[onnx_io.TensorData]:
    """TensorProto .pb loader via the C++ library (golden I/O data path,
    counterpart of the reference's read_input_data, src/main.rs:44-53)."""
    lib = get_lib()
    if lib is None:
        return None
    with open(path, "rb") as f:
        buf = f.read()
    h = lib.oriet_parse_tensor(buf, len(buf))
    if not h:
        return None
    try:
        dtype_code = int(lib.oriet_tensor_dtype(h))
        np_dtype = onnx_io.DTYPE_TO_NUMPY.get(dtype_code)
        if np_dtype is None:
            return None
        ndim = lib.oriet_tensor_ndim(h)
        dims = lib.oriet_tensor_dims(h)
        shape = tuple(int(dims[j]) for j in range(ndim))
        ln = ctypes.c_size_t()
        ptr = lib.oriet_tensor_data(h, ctypes.byref(ln))
        raw = ctypes.string_at(ptr, ln.value)
        n_elems = int(np.prod(shape, dtype=np.int64))
        if ln.value == n_elems * np_dtype.itemsize:
            arr = np.frombuffer(raw, dtype=np_dtype.newbyteorder("<")
                                ).astype(np_dtype)
        elif np.issubdtype(np_dtype, np.integer) and ln.value == n_elems * 8:
            arr = np.frombuffer(raw, dtype="<i8").astype(np_dtype)
        else:
            return None
        name = (lib.oriet_tensor_name(h) or b"").decode()
        return onnx_io.TensorData(name=name, array=arr.reshape(shape))
    finally:
        lib.oriet_free_tensor(h)


def load_model_native(path: str) -> Optional[onnx_io.ModelProto]:
    """Parse via the C++ library.

    Returns None only for CAPABILITY gaps (library missing/unbuildable,
    dtype the bridge can't decode) — the caller then falls back to the
    pure-Python parser. A MALFORMED buffer raises ModelParseError carrying
    the C++ parser's own error string (never a silent None: a corrupt file
    must fail loudly and identically through either parser)."""
    lib = get_lib()
    if lib is None:
        return None
    with open(path, "rb") as f:
        buf = f.read()
    h = lib.oriet_parse_model(buf, len(buf))
    if not h:
        raise onnx_io.ModelParseError(
            f"{path}: native parser rejected the buffer (no handle)")
    try:
        err = lib.oriet_error(h)
        if err:
            raise onnx_io.ModelParseError(
                f"{path}: invalid ONNX ModelProto: {err.decode(errors='replace')}")

        g = onnx_io.GraphProto(name=(lib.oriet_graph_name(h) or b"").decode())
        for i in range(lib.oriet_num_nodes(h)):
            n = onnx_io.NodeProto(
                op_type=lib.oriet_node_op(h, i).decode(),
                input=[lib.oriet_node_input(h, i, j).decode()
                       for j in range(lib.oriet_node_num_inputs(h, i))],
                output=[lib.oriet_node_output(h, i, j).decode()
                        for j in range(lib.oriet_node_num_outputs(h, i))],
                name=(lib.oriet_node_name(h, i) or b"").decode(),
                domain=(lib.oriet_node_domain(h, i) or b"").decode(),
            )
            for j in range(lib.oriet_node_num_attrs(h, i)):
                ln = ctypes.c_size_t()
                ptr = lib.oriet_node_attr_raw(h, i, j, ctypes.byref(ln))
                raw = ctypes.string_at(ptr, ln.value)
                a = onnx_io._parse_attribute(raw)
                n.attributes[a.name] = a
            g.nodes.append(n)

        for i in range(lib.oriet_num_initializers(h)):
            name = lib.oriet_init_name(h, i).decode()
            dtype_code = int(lib.oriet_init_dtype(h, i))
            np_dtype = onnx_io.DTYPE_TO_NUMPY.get(dtype_code)
            if np_dtype is None:
                return None
            ndim = lib.oriet_init_ndim(h, i)
            dims_ptr = lib.oriet_init_dims(h, i)
            shape = tuple(int(dims_ptr[j]) for j in range(ndim))
            ln = ctypes.c_size_t()
            ptr = lib.oriet_init_data(h, i, ctypes.byref(ln))
            raw = ctypes.string_at(ptr, ln.value)
            n_elems = int(np.prod(shape, dtype=np.int64))
            if ln.value == n_elems * np_dtype.itemsize:
                arr = np.frombuffer(raw, dtype=np_dtype.newbyteorder("<")
                                    ).astype(np_dtype)
            elif np.issubdtype(np_dtype, np.integer) and ln.value == n_elems * 8:
                # typed int fields were widened to int64 by the C++ side
                arr = np.frombuffer(raw, dtype="<i8").astype(np_dtype)
            elif np_dtype == np.float32 and ln.value == n_elems * 4:
                arr = np.frombuffer(raw, dtype="<f4")
            else:
                return None
            g.initializers[name] = arr.reshape(shape)

        g.inputs = _vi_list(lib, h, 0)
        g.outputs = _vi_list(lib, h, 1)
        g.value_infos = _vi_list(lib, h, 2)

        imports = {
            (lib.oriet_opset_import_domain(h, i) or b"").decode():
                int(lib.oriet_opset_import_version(h, i))
            for i in range(int(lib.oriet_num_opset_imports(h)))
        }
        return onnx_io.ModelProto(
            graph=g,
            ir_version=int(lib.oriet_ir_version(h)),
            opset_version=int(lib.oriet_opset(h)) or 13,
            opset_imports=imports,
            producer_name=(lib.oriet_producer(h) or b"").decode(),
            producer_version=(lib.oriet_producer_version(h) or b"").decode(),
            domain=(lib.oriet_domain(h) or b"").decode(),
            model_version=int(lib.oriet_model_version(h)),
        )
    finally:
        lib.oriet_free_model(h)
