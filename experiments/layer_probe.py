import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from onnx_rusty_inference_engine_tpu.utils.timing import device_loop_timer

rng = np.random.default_rng(0)
B=64
def mk(s, dt=jnp.int8): return jnp.asarray(rng.integers(-127,127,s), dt)

def conv_req(x, w, s=1, p=0):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW","OIHW","NCHW"))
    a = lax.conv_general_dilated(x,w,(s,s),[(p,p),(p,p)],dimension_numbers=dn,preferred_element_type=jnp.int32)
    return jnp.clip(jnp.round(a.astype(jnp.float32)*0.0123),-128,127).astype(jnp.int8)

def t_conv(name, xs, ws, s=1, p=0, reps=1):
    x = mk(xs); w = mk(ws)
    def step(w, x):
        y = conv_req(x, w, s, p)
        dep = (y.ravel()[:1]*0).reshape(())
        return x + dep
    t = device_loop_timer(step, x, 50, params=w)
    oh=(xs[2]+2*p-ws[2])//s+1
    fl=2*B*ws[0]*oh*oh*ws[1]*ws[2]*ws[3]
    print(f"{name:22s} {t*1e6*reps:7.0f} us  ({fl/t/1e12:5.1f} TOP/s) x{reps}")
    return t*reps

def t_pool(name, xs, k, s, reps=1):
    x = mk(xs)
    def step(_, x2):
        y = lax.reduce_window(x2, jnp.int8(-128), lax.max, (1,1,k,k), (1,1,s,s), "VALID")
        dep = (y.ravel()[:1]*0).reshape(())
        return x2 + dep
    t = device_loop_timer(step, x, 50, params=jnp.zeros(1))
    print(f"{name:22s} {t*1e6*reps:7.0f} us x{reps}")
    return t*reps

tot=0
tot+=t_conv("conv1 7x7/2 3->96", (B,3,224,224), (96,3,7,7), 2)
tot+=t_pool("maxpool1 3/2 109", (B,96,109,109), 3, 2)
tot+=t_conv("fire2/3 squeeze 1x1", (B,128,54,54), (16,128,1,1), reps=2)   # fire3; fire2 is 96->16
tot+=t_conv("fire2-3 exp1x1 16>64", (B,16,54,54), (64,16,1,1), reps=2)
tot+=t_conv("fire2-3 exp3x3 16>64", (B,16,54,54), (64,16,3,3), p=1, reps=2)
tot+=t_conv("fire4 squeeze 128>32", (B,128,54,54), (32,128,1,1))
tot+=t_conv("fire4 exp1x1 32>128", (B,32,54,54), (128,32,1,1))
tot+=t_conv("fire4 exp3x3 32>128", (B,32,54,54), (128,32,3,3), p=1)
tot+=t_pool("maxpool4 3/2 54", (B,256,54,54), 3, 2)
tot+=t_conv("fire5 squeeze 256>32", (B,256,26,26), (32,256,1,1))
tot+=t_conv("fire5 exp1x1 32>128", (B,32,26,26), (128,32,1,1))
tot+=t_conv("fire5 exp3x3 32>128", (B,32,26,26), (128,32,3,3), p=1)
tot+=t_conv("fire6-7 sq 256>48", (B,256,26,26), (48,256,1,1), reps=2)
tot+=t_conv("fire6-7 e1 48>192", (B,48,26,26), (192,48,1,1), reps=2)
tot+=t_conv("fire6-7 e3 48>192", (B,48,26,26), (192,48,3,3), p=1, reps=2)
tot+=t_conv("fire8 sq 384>64", (B,384,26,26), (64,384,1,1))
tot+=t_conv("fire8 e1 64>256", (B,64,26,26), (256,64,1,1))
tot+=t_conv("fire8 e3 64>256", (B,64,26,26), (256,64,3,3), p=1)
tot+=t_pool("maxpool8 3/2 26", (B,512,26,26), 3, 2)
tot+=t_conv("fire9 sq 512>64", (B,512,12,12), (64,512,1,1))
tot+=t_conv("fire9 e1 64>256", (B,64,12,12), (256,64,1,1))
tot+=t_conv("fire9 e3 64>256", (B,64,12,12), (256,64,3,3), p=1)
tot+=t_conv("conv10 512>1000", (B,512,12,12), (1000,512,1,1))
print(f"TOTAL conv+pool: {tot*1e3:.2f} ms   (full step measured ~3.1 ms)")
