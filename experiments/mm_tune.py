import sys, pathlib, itertools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from onnx_rusty_inference_engine_tpu.utils.timing import device_loop_timer
from onnx_rusty_inference_engine_tpu.ops.kernels.qmatmul import qmatmul_int8_requant

rng=np.random.default_rng(0)
M,K,N = 64*54*54, 288, 128
a=jnp.asarray(rng.integers(-127,127,(M,K)),jnp.int8)
b=jnp.asarray(rng.integers(-127,127,(K,N)),jnp.int8)
mult=jnp.full((N,),0.01,jnp.float32)
best=None
for bm in (256,512,1024,2048):
    for bk in (288,):
        for bn in (128,):
            def step(b,a,bm=bm,bk=bk,bn=bn):
                y=qmatmul_int8_requant(a,b,mult,block_m=bm,block_n=bn,block_k=bk)
                dep=(y.ravel()[:1]*0).reshape(())
                return a+dep
            try:
                t=device_loop_timer(step,a,50,params=b)
            except Exception as e:
                print(bm,bk,bn,"FAIL",str(e)[:80]); continue
            fl=2*M*K*N
            print(f"bm{bm} bk{bk} bn{bn}: {t*1e6:7.1f} us  {fl/t/1e12:6.1f} TOP/s")
