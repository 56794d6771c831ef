"""Probe: int8 conv throughput NCHW vs NHWC on key SqueezeNet shapes.

Decides whether the quantized path should carry an NHWC layout pass.
Run: PYTHONPATH=/root/repo python experiments/layout_probe.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from onnx_rusty_inference_engine_tpu.utils.timing import device_loop_timer

rng = np.random.default_rng(0)
B = 64

SHAPES = [  # (Cin, H, W, Cout, k, stride) — SqueezeNet hot layers
    ("conv1", 3, 224, 224, 96, 7, 2),
    ("squeeze", 128, 27, 27, 32, 1, 1),
    ("expand3", 48, 27, 27, 192, 3, 1),
    ("conv10", 512, 13, 13, 1000, 1, 1),
]


def probe(name, ci, h, w, co, k, s):
    pad = (k - 1) // 2
    x = jnp.asarray(rng.integers(-127, 127, (B, ci, h, w), dtype=np.int8))
    wt = jnp.asarray(rng.integers(-127, 127, (co, ci, k, k), dtype=np.int8))
    x_nhwc = jnp.transpose(x, (0, 2, 3, 1))
    w_hwio = jnp.transpose(wt, (2, 3, 1, 0))

    def step_nchw(c):
        y = lax.conv_general_dilated(
            c, wt, (s, s), [(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.int32)
        # requant back to int8 and feed a same-shaped tensor onward
        y8 = jnp.clip(jnp.round(y.astype(jnp.float32) * 0.01), -128, 127
                      ).astype(jnp.int8)
        dep = y8.ravel()[0] * 0
        return c + dep

    def step_nhwc(c):
        y = lax.conv_general_dilated(
            c, w_hwio, (s, s), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y8 = jnp.clip(jnp.round(y.astype(jnp.float32) * 0.01), -128, 127
                      ).astype(jnp.int8)
        dep = y8.ravel()[0] * 0
        return c + dep

    t1 = device_loop_timer(step_nchw, x, iters=300)
    t2 = device_loop_timer(step_nhwc, x_nhwc, iters=300)
    ho, wo = (h + 2 * pad - k) // s + 1, (w + 2 * pad - k) // s + 1
    gops = 2 * B * co * ci * k * k * ho * wo / 1e9
    print(f"{name:8s} NCHW {t1*1e3:7.3f}ms ({gops/t1/1e3:6.1f} TOP/s)   "
          f"NHWC {t2*1e3:7.3f}ms ({gops/t2/1e3:6.1f} TOP/s)   "
          f"NHWC speedup {t1/t2:4.2f}x")


if __name__ == "__main__":
    for cfg in SHAPES:
        probe(*cfg)
