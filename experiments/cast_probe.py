import sys, pathlib, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def mk(fn):
    def kernel(p_ref, o_ref):
        o_ref[:] = fn(p_ref[:])
    x = jnp.asarray(np.arange(256*256).reshape(256,256) % 251, jnp.uint8)
    out = pl.pallas_call(kernel,
        in_specs=[pl.BlockSpec((256,256), lambda: (0,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((256,256), lambda: (0,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256,256), jnp.float32))(x)
    return np.asarray(out)

variants = {
  "u8->i32->f32": lambda p: ((p & 0xF).astype(jnp.int32) - 8).astype(jnp.float32),
  "u8->i16->f32": lambda p: ((p & 0xF).astype(jnp.int16).astype(jnp.float32) - 8.0),
  "u8->i8->i32->f32": lambda p: (p & 0xF).astype(jnp.int8).astype(jnp.int32).astype(jnp.float32) - 8.0,
  "shift_u8->i32": lambda p: ((p >> 4).astype(jnp.int32) - 8).astype(jnp.float32),
}
for name, fn in variants.items():
    try:
        r = mk(fn)
        ref_p = (np.arange(256*256).reshape(256,256) % 251).astype(np.uint8)
        want = (ref_p & 0xF).astype(np.float32) - 8 if "shift" not in name else (ref_p >> 4).astype(np.float32) - 8
        ok = np.allclose(r, want)
        print(f"{name}: COMPILES correct={ok}")
    except Exception as e:
        print(f"{name}: FAIL {str(e).splitlines()[0][:100]}")
