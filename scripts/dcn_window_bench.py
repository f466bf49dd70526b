import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from advancedliteratemachinery_tpu.ops.deform_conv import deform_conv2d

def timeit(fn, *args, iters=10):
    t0 = time.perf_counter(); out = fn(*args); jax.tree.map(np.asarray, out)
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.tree.map(np.asarray, out)
    return (time.perf_counter() - t0) / iters * 1000, cs

rng = np.random.default_rng(0)
import itertools
RS = [int(r) for r in os.environ.get("RS", "3").split(",")]
shapes = [(8,192,192,64,64),(8,96,96,256,128)]
for (B,H,W,Ci,Co), R in itertools.product(shapes, RS):
    x  = jnp.asarray(rng.standard_normal((B,H,W,Ci)), jnp.bfloat16)
    off= jnp.asarray(rng.standard_normal((B,H,W,9,2))*1.0, jnp.bfloat16)
    m  = jnp.asarray(rng.uniform(0.3,1,(B,H,W,9)), jnp.bfloat16)
    w  = jnp.asarray(rng.standard_normal((3,3,Ci,Co))*0.05, jnp.bfloat16)
    f = jax.jit(lambda x,o,mm,w,R=R: deform_conv2d(x,o,mm,w,window_radius=R))
    ms, cs = timeit(f, x, off, m, w)
    print(f"win R={R} B{B} {H}x{W} {Ci}->{Co}: {ms:7.2f} ms (compile {cs:.0f}s)", flush=True)
