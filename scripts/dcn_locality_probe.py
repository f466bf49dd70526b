import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from advancedliteratemachinery_tpu.ops.deform_conv import deform_conv2d

def timeit(fn, *args, iters=10):
    t0 = time.perf_counter(); out = fn(*args); np.asarray(out)
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1000, cs

rng = np.random.default_rng(0)
B,H,W,Ci,Co = 1,192,192,64,64
x  = jnp.asarray(rng.standard_normal((B,H,W,Ci)), jnp.bfloat16)
m  = jnp.asarray(rng.uniform(0.3,1,(B,H,W,9)), jnp.bfloat16)
w  = jnp.asarray(rng.standard_normal((3,3,Ci,Co))*0.05, jnp.bfloat16)
f = jax.jit(lambda x,o,mm,w: deform_conv2d(x,o,mm,w))
for label, off_np in [
    ("zero", np.zeros((B,H,W,9,2))),
    ("small ±0.3", rng.standard_normal((B,H,W,9,2))*0.3),
    ("unit ±1.0", rng.standard_normal((B,H,W,9,2))*1.0),
    ("spread ±1.5", rng.standard_normal((B,H,W,9,2))*1.5),
    ("wild ±8", rng.standard_normal((B,H,W,9,2))*8.0),
]:
    off = jnp.asarray(off_np, jnp.bfloat16)
    ms, cs = timeit(f, x, off, m, w)
    print(f"dcn 192² 64ch offsets={label:12s}: {ms:7.2f} ms", flush=True)
