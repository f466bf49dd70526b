import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from advancedliteratemachinery_tpu.ops.deform_conv import deform_conv2d
from advancedliteratemachinery_tpu.ops.deform_conv_pallas import dcn_windowed_pallas

def timeit(fn, *args, iters=100):
    t0 = time.perf_counter(); out = fn(*args); np.asarray(out)
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1000, cs

rng = np.random.default_rng(0)
for (B,H,W,Ci,Co) in [(1,192,192,64,64),(8,192,192,64,64),(1,192,192,128,64),(8,96,96,256,128),(8,48,48,512,256)]:
    x  = jnp.asarray(rng.standard_normal((B,H,W,Ci)), jnp.bfloat16)
    off= jnp.asarray(np.clip(rng.standard_normal((B,H,W,9,2)),-2.9,2.9), jnp.bfloat16)
    m  = jnp.asarray(rng.uniform(0.3,1,(B,H,W,9)), jnp.bfloat16)
    w  = jnp.asarray(rng.standard_normal((3,3,Ci,Co))*0.05, jnp.bfloat16)
    f_old = jax.jit(lambda x,o,mm,w: deform_conv2d(x,o,mm,w))
    ms0, _ = timeit(f_old, x, off, m, w, iters=30)
    f_pal = jax.jit(lambda x,o,mm,w: dcn_windowed_pallas(x,o,mm,w,radius=3))
    ms1, cs1 = timeit(f_pal, x, off, m, w)
    a = np.asarray(f_old(x,off,m,w), np.float32); b = np.asarray(f_pal(x,off,m,w), np.float32)
    err = np.abs(a-b).max()/(np.abs(a).max()+1e-6)
    print(f"B{B} {H}x{W} {Ci}->{Co}: gather {ms0:7.2f} ms | pallas {ms1:7.2f} ms ({ms0/ms1:4.1f}x, compile {cs1:.0f}s, relerr {err:.1e})", flush=True)
