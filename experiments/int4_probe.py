import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from onnx_rusty_inference_engine_tpu.quant import pack_int4
from onnx_rusty_inference_engine_tpu.ops.kernels.qmatmul_int4 import qmatmul_int4_bf16

rng=np.random.default_rng(0)
for (M,K,N) in [(8,768,2304),(8,3072,768),(8,768,50257),(16,64,64)]:
    a=rng.standard_normal((M,K)).astype(np.float32)
    w=rng.standard_normal((K,N)).astype(np.float32)*0.05
    packed,scales=pack_int4(w)
    out=np.asarray(qmatmul_int4_bf16(jnp.asarray(a),jnp.asarray(packed),jnp.asarray(scales)))
    # reference dequant matmul
    qb=K//scales.shape[1]
    wt=w.T.reshape(N,K//qb,qb)
    q=np.clip(np.round(wt/scales[:,:,None]),-8,7)
    wd=(q*scales[:,:,None]).reshape(N,K).T
    want=a.astype(np.float32)@wd
    err=np.abs(out-want).max()/max(1e-6,np.abs(want).max())
    print(f"M{M} K{K} N{N}: rel_err {err:.4f}", "OK" if err<0.02 else "FAIL")
