import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from advancedliteratemachinery_tpu.ops.deform_conv import deform_conv2d

rng = np.random.default_rng(0)
# 1. trivial op dispatch cost
x0 = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
f0 = jax.jit(lambda x: x + 1.0)
np.asarray(f0(x0))
for iters in (10, 100):
    t0 = time.perf_counter()
    for _ in range(iters): out = f0(x0)
    np.asarray(out)
    print(f"trivial add, iters={iters}: {(time.perf_counter()-t0)/iters*1000:.3f} ms/call", flush=True)

# 2. DCN at two very different sizes, many iters
for (H, C) in [(24, 64), (192, 64)]:
    x  = jnp.asarray(rng.standard_normal((1,H,H,C)), jnp.bfloat16)
    off= jnp.asarray(rng.standard_normal((1,H,H,9,2)), jnp.bfloat16)
    m  = jnp.asarray(rng.uniform(0.3,1,(1,H,H,9)), jnp.bfloat16)
    w  = jnp.asarray(rng.standard_normal((3,3,C,C))*0.05, jnp.bfloat16)
    f = jax.jit(lambda x,o,mm,w: deform_conv2d(x,o,mm,w))
    np.asarray(f(x,off,m,w))
    for iters in (10, 100):
        t0 = time.perf_counter()
        for _ in range(iters): out = f(x,off,m,w)
        np.asarray(out)
        print(f"dcn {H}² {C}ch iters={iters}: {(time.perf_counter()-t0)/iters*1000:.3f} ms/call", flush=True)
