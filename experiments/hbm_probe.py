import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from onnx_rusty_inference_engine_tpu.utils.timing import device_loop_timer
d=jax.devices()[0]
print("device:", d.device_kind, d.platform, getattr(d,'memory_stats',lambda:{})())
rng=np.random.default_rng(0)
x=jnp.asarray(rng.standard_normal((4096,8192)),jnp.float32)  # 128MB
def step(_,x):
    return x*1.000001
t=device_loop_timer(step,x,100,params=jnp.zeros(1))
print(f"elementwise x*c 128MB: {t*1e6:.1f} us -> {2*x.nbytes/t/1e9:.0f} GB/s")
# big matmul for peak TOPS
a=jnp.asarray(rng.integers(-127,127,(4096,4096)),jnp.int8)
b=jnp.asarray(rng.integers(-127,127,(4096,4096)),jnp.int8)
def step2(b,a):
    y=jnp.matmul(a,b,preferred_element_type=jnp.int32)
    dep=(y.ravel()[:1]*0).astype(jnp.int8).reshape(())
    return a+dep
t=device_loop_timer(step2,a,50,params=b)
print(f"int8 4096^3 matmul: {t*1e6:.1f} us -> {2*4096**3/t/1e12:.0f} TOP/s")
abf=a.astype(jnp.bfloat16); bbf=b.astype(jnp.bfloat16)
def step3(b,a):
    y=jnp.matmul(a,b,preferred_element_type=jnp.float32)
    dep=(y.ravel()[:1]*0).astype(jnp.bfloat16).reshape(())
    return a+dep
t=device_loop_timer(step3,abf,50,params=bbf)
print(f"bf16 4096^3 matmul: {t*1e6:.1f} us -> {2*4096**3/t/1e12:.0f} TFLOP/s")
