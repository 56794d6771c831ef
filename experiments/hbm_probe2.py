import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from onnx_rusty_inference_engine_tpu.utils.timing import device_loop_timer
rng=np.random.default_rng(0)
x=jnp.asarray(rng.standard_normal((8192,16384)),jnp.float32)  # 512MB
def step(_,x): return x*1.000001
t=device_loop_timer(step,x,30,params=jnp.zeros(1))
print(f"elementwise 512MB: {t*1e6:.1f} us -> {2*x.nbytes/t/1e9:.0f} GB/s")
del x
# compute-dense int8 matmul with int8 out: M=N=2048, K=16384
M=N=2048; K=16384
a=jnp.asarray(rng.integers(-127,127,(M,K)),jnp.int8)
b=jnp.asarray(rng.integers(-127,127,(K,N)),jnp.int8)
def step2(b,a):
    y=jnp.clip(jnp.round(jnp.matmul(a,b,preferred_element_type=jnp.int32).astype(jnp.float32)*0.001),-128,127).astype(jnp.int8)
    dep=(y.ravel()[:1]*0).reshape(())
    return a+dep
t=device_loop_timer(step2,a,50,params=b)
print(f"int8 {M}x{K}x{N} -> s8: {t*1e6:.1f} us -> {2*M*K*N/t/1e12:.0f} TOP/s")
bbf=b.astype(jnp.bfloat16); abf=a.astype(jnp.bfloat16)
def step3(b,a):
    y=(jnp.matmul(a,b,preferred_element_type=jnp.float32)*0.001).astype(jnp.bfloat16)
    dep=(y.ravel()[:1]*0).reshape(())
    return a+dep
t=device_loop_timer(step3,abf,50,params=bbf)
print(f"bf16 {M}x{K}x{N}: {t*1e6:.1f} us -> {2*M*K*N/t/1e12:.0f} TFLOP/s")
