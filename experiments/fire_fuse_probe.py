"""ONE targeted attack on the worst conv bucket (VERDICT r4 #5): fire
expand1x1 + expand3x3 as a SINGLE 3x3 conv.

A SqueezeNet fire module's two expand convs read the same squeeze output
and concat their results. Zero-padding each 1x1 filter to 3x3 (center
tap only) and stacking it with the 3x3 filters makes the pair + concat
ONE conv: same math exactly (the padded taps multiply either zeros from
SAME-padding or pixels weighted by zero), one bigger MXU op, no concat.
Cost: the 1x1 half's MACs are 9x'd — the bet is that the expand convs
are so far under peak (20-48% at b64, PERF.md) that utilization buys
more than the wasted MACs spend. This probe answers it per fire shape,
int8, chained on-device.

Run (real chip): python experiments/fire_fuse_probe.py [batch]
"""

import sys, pathlib, json, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from onnx_rusty_inference_engine_tpu.utils.timing import device_loop_timer

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
# (squeeze_ch, expand_ch_each, spatial) per SqueezeNet 1.0 stage
SHAPES = [(16, 64, 55), (32, 128, 55), (48, 192, 27), (64, 256, 13)]
DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                ("NCHW", "OIHW", "NCHW"))


def requant(acc_i32, scale):                      # per-out-channel
    y = jnp.round(acc_i32.astype(jnp.float32) * scale[None, :, None, None])
    return jnp.clip(y, -127, 127).astype(jnp.int8)


def conv_s8(x, w, pad):
    return lax.conv_general_dilated(
        x.astype(jnp.int8), w.astype(jnp.int8), (1, 1),
        [(pad, pad), (pad, pad)], dimension_numbers=DN,
        preferred_element_type=jnp.int32)


def make_pair(E):
    def f(params, x):
        y1 = requant(conv_s8(x, params["w1"], 0), params["s1"])
        y3 = requant(conv_s8(x, params["w3"], 1), params["s3"])
        return jnp.concatenate([y1, y3], axis=1)
    return f


def make_fused(E):
    def f(params, x):
        return requant(conv_s8(x, params["wf"], 1), params["sf"])
    return f


def bench(fn, params, x, iters=60):
    def step(p, carry):
        out = fn(p, carry["x"])
        dep = jnp.sum(out.astype(jnp.int32).ravel()[:1]) * 0
        return {"x": carry["x"] + dep.astype(carry["x"].dtype)}
    return device_loop_timer(step, {"x": x}, iters=iters, params=params)


rng = np.random.default_rng(0)
for S, E, HW in SHAPES:
    x = jnp.asarray(rng.integers(-100, 100, (B, S, HW, HW)), jnp.int8)
    w1 = rng.integers(-100, 100, (E, S, 1, 1)).astype(np.int8)
    w3 = rng.integers(-100, 100, (E, S, 3, 3)).astype(np.int8)
    s1 = (rng.uniform(0.5, 2, (E,)) * 1e-4).astype(np.float32)
    s3 = (rng.uniform(0.5, 2, (E,)) * 1e-4).astype(np.float32)
    w1f = np.zeros((E, S, 3, 3), np.int8)
    w1f[:, :, 1, 1] = w1[:, :, 0, 0]              # center tap
    pp = {"w1": jnp.asarray(w1), "w3": jnp.asarray(w3),
          "s1": jnp.asarray(s1), "s3": jnp.asarray(s3)}
    pf = {"wf": jnp.concatenate([jnp.asarray(w1f), jnp.asarray(w3)], 0),
          "sf": jnp.concatenate([jnp.asarray(s1), jnp.asarray(s3)], 0)}

    out_a = np.asarray(jax.jit(make_pair(E))(pp, x))
    out_b = np.asarray(jax.jit(make_fused(E))(pf, x))
    assert np.array_equal(out_a, out_b), "fused form must be exact"

    t_pair = bench(make_pair(E), pp, x)
    t_fuse = bench(make_fused(E), pf, x)
    macs_pair = B * HW * HW * S * E * (1 + 9)
    macs_fuse = B * HW * HW * S * E * (9 + 9)
    print(json.dumps({
        "fire": f"s{S}_e{E}_hw{HW}", "batch": B,
        "pair_us": round(t_pair * 1e6, 1),
        "fused_us": round(t_fuse * 1e6, 1),
        "speedup": round(t_pair / t_fuse, 3),
        "pair_tops": round(2 * macs_pair / t_pair / 1e12, 1),
        "fused_tops": round(2 * macs_fuse / t_fuse / 1e12, 1),
    }), flush=True)
