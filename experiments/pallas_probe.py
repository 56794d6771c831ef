"""Validate + benchmark the Pallas int8 matmul kernels vs XLA's native path.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/pallas_probe.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import numpy as np
import jax
import jax.numpy as jnp

from onnx_rusty_inference_engine_tpu.ops.kernels.qmatmul import (
    qmatmul_int8,
    qmatmul_int8_requant,
)
from onnx_rusty_inference_engine_tpu.utils.timing import device_loop_timer

rng = np.random.default_rng(0)


def check_correctness():
    for (m, k, n) in [(256, 512, 256), (200, 300, 100), (1024, 2048, 1024)]:
        a = rng.integers(-127, 127, (m, k), dtype=np.int8)
        b = rng.integers(-127, 127, (k, n), dtype=np.int8)
        want = a.astype(np.int32) @ b.astype(np.int32)
        got = np.asarray(qmatmul_int8(jnp.asarray(a), jnp.asarray(b)))
        assert np.array_equal(got, want), f"mismatch at {(m, k, n)}"
        mult = np.float32(1e-4)
        got_q = np.asarray(qmatmul_int8_requant(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(mult)))
        want_q = np.clip(np.round(want.astype(np.float64) * mult), -128, 127
                         ).astype(np.int8)
        # rounding mode at .5 may differ by 1 LSB
        assert np.abs(got_q.astype(np.int32) - want_q.astype(np.int32)).max() <= 1
        print(f"correct @ {(m, k, n)}")


def bench(M=4096, K=4096, N=4096, iters=300):
    a = jnp.asarray(rng.integers(-127, 127, (M, K), dtype=np.int8))
    b = jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))
    flops = 2 * M * N * K

    def step_pallas(c):
        y = qmatmul_int8(c, b)
        return (c + (y.ravel()[0] % 2).astype(jnp.int8) * 0)

    def step_xla(c):
        y = jnp.matmul(c, b, preferred_element_type=jnp.int32)
        return (c + (y.ravel()[0] % 2).astype(jnp.int8) * 0)

    t_p = device_loop_timer(step_pallas, a, iters=iters)
    t_x = device_loop_timer(step_xla, a, iters=iters)
    print(f"int8 {M}x{K}x{N}: pallas {t_p*1e3:.3f}ms ({flops/t_p/1e12:.0f} TOP/s)  "
          f"xla {t_x*1e3:.3f}ms ({flops/t_x/1e12:.0f} TOP/s)  ratio {t_x/t_p:.2f}")


if __name__ == "__main__":
    check_correctness()
    bench()
