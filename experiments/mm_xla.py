import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from onnx_rusty_inference_engine_tpu.utils.timing import device_loop_timer
rng=np.random.default_rng(0)
M,K,N = 64*54*54, 288, 128
a8=jnp.asarray(rng.integers(-127,127,(M,K)),jnp.int8)
b8=jnp.asarray(rng.integers(-127,127,(K,N)),jnp.int8)
abf=a8.astype(jnp.bfloat16); bbf=b8.astype(jnp.bfloat16)

def mk_step(dot):
    def step(b,a):
        y=dot(a,b)
        dep=(y.ravel()[:1]*0).astype(a.dtype).reshape(())
        return a+dep
    return step

t=device_loop_timer(mk_step(lambda a,b: jnp.clip(jnp.round(jnp.matmul(a,b,preferred_element_type=jnp.int32).astype(jnp.float32)*0.01),-128,127).astype(jnp.int8)), a8, 50, params=b8)
print(f"XLA int8+requant: {t*1e6:7.1f} us  {2*M*K*N/t/1e12:6.1f} TOP/s")
t=device_loop_timer(mk_step(lambda a,b: jnp.matmul(a,b,preferred_element_type=jnp.float32)), abf, 50, params=bbf)
print(f"XLA bf16:        {t*1e6:7.1f} us  {2*M*K*N/t/1e12:6.1f} TFLOP/s")
