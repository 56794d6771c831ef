import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from onnx_rusty_inference_engine_tpu.utils.timing import device_loop_timer

rng=np.random.default_rng(0)
B=64
xf=jnp.asarray(rng.standard_normal((B,3,224,224)),jnp.float32)
w=jnp.asarray(rng.integers(-127,127,(96,3,7,7)),jnp.int8)
dn = lambda x,w: lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW","OIHW","NCHW"))

def q(x): return jnp.clip(jnp.round(x*12.7),-128,127).astype(jnp.int8)
def req(a): return jnp.clip(jnp.round(a.astype(jnp.float32)*0.003),-128,127).astype(jnp.int8)

def base(w, xf):
    x = q(xf)
    a = lax.conv_general_dilated(x,w,(2,2),"VALID",dimension_numbers=dn(x,w),preferred_element_type=jnp.int32)
    y = req(a)
    dep=(y.ravel()[:1].astype(jnp.float32)*0).reshape(())
    return xf+dep

# precompute transformed weights [96, 12, 4, 4]; channel order (p,q,c) DCR-ONNX: (p*2+q)*C+c
def transform_w(w):
    O,C,KH,KW = w.shape
    KH2, KW2 = (KH+1)//2, (KW+1)//2
    w2 = np.zeros((O, 4*C, KH2, KW2), np.int8)
    wn = np.asarray(w)
    for p in range(2):
        for qq in range(2):
            for c in range(C):
                for m in range(KH2):
                    for n in range(KW2):
                        kh, kw = 2*m+p, 2*n+qq
                        if kh < KH and kw < KW:
                            w2[:, (p*2+qq)*C+c, m, n] = wn[:, c, kh, kw]
    return jnp.asarray(w2)
w2 = transform_w(w)

def s2d(x):  # [B,C,H,W] -> [B,4C,H/2,W/2], ONNX SpaceToDepth DCR order
    B_,C,H,W = x.shape
    x = x.reshape(B_, C, H//2, 2, W//2, 2)
    x = jnp.transpose(x, (0,3,5,1,2,4))
    return x.reshape(B_, 4*C, H//2, W//2)

def s2dv(w2, xf):
    x = q(xf)
    xs = s2d(x)
    a = lax.conv_general_dilated(xs,w2,(1,1),"VALID",dimension_numbers=dn(xs,w2),preferred_element_type=jnp.int32)
    y = req(a)
    dep=(y.ravel()[:1].astype(jnp.float32)*0).reshape(())
    return xf+dep

# correctness check
ref = lax.conv_general_dilated(q(xf),w,(2,2),"VALID",dimension_numbers=dn(q(xf),w),preferred_element_type=jnp.int32)
new = lax.conv_general_dilated(s2d(q(xf)),w2,(1,1),"VALID",dimension_numbers=dn(s2d(q(xf)),w2),preferred_element_type=jnp.int32)
print("match:", bool(jnp.all(ref==new)), ref.shape, new.shape)

t1=device_loop_timer(base,xf,50,params=w)
t2=device_loop_timer(s2dv,xf,50,params=w2)
print(f"base q+conv1: {t1*1e6:.0f} us   s2d q+conv1: {t2*1e6:.0f} us")
