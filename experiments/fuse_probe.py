import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from onnx_rusty_inference_engine_tpu.utils.timing import device_loop_timer

B,C,H,W,O,K,S = 64,96,111,111,256,3,2
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(-127,127,(B,C,H,W)),jnp.int8)
w = jnp.asarray(rng.integers(-127,127,(O,C,K,K)),jnp.int8)
dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW","OIHW","NCHW"))

def conv(x,w):
    return lax.conv_general_dilated(x,w,(S,S),"VALID",dimension_numbers=dn,preferred_element_type=jnp.int32)

def step_s32(w, x):
    a = conv(x,w)
    dep = (a.ravel()[:1].astype(jnp.int8) * 0).reshape(())
    return x + dep

def step_req(w, x):
    a = conv(x,w)
    y = jnp.clip(jnp.round(a.astype(jnp.float32)*0.0123),-128,127).astype(jnp.int8)
    dep = (y.ravel()[:1] * 0).reshape(())
    return x + dep

t1 = device_loop_timer(step_s32, x, 100, params=w)
t2 = device_loop_timer(step_req, x, 100, params=w)
oh=(H-K)//S+1; out=B*O*oh*oh
fl=2*out*C*K*K
print(f"s32-only: {t1*1e6:.0f} us ({fl/t1/1e12:.0f} TOP/s)  +requant: {t2*1e6:.0f} us  delta {((t2-t1))*1e6:.0f} us; s32 RT roofline {out*8/819e9*1e6:.0f} us")
