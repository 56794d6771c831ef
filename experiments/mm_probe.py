import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from onnx_rusty_inference_engine_tpu.utils.timing import device_loop_timer
from onnx_rusty_inference_engine_tpu.ops.kernels.qmatmul import qmatmul_int8_requant

rng=np.random.default_rng(0)
# fire4-expand3x3 as im2col matmul: M=64*54*54, K=32*9, N=128
for (M,K,N) in [(64*54*54, 288, 128), (64*54*54, 144, 64), (64*26*26, 432, 192), (64*112*112, 147, 96)]:
    a=jnp.asarray(rng.integers(-127,127,(M,K)),jnp.int8)
    b=jnp.asarray(rng.integers(-127,127,(K,N)),jnp.int8)
    mult=jnp.full((N,),0.01,jnp.float32)
    def step(b,a):
        y=qmatmul_int8_requant(a,b,mult)
        dep=(y.ravel()[:1]*0).reshape(())
        return a+dep
    t=device_loop_timer(step,a,50,params=b)
    fl=2*M*K*N
    print(f"M{M} K{K} N{N}: {t*1e6:7.1f} us  {fl/t/1e12:6.1f} TOP/s")
