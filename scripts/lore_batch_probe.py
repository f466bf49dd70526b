import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

def timeit(fn, *args, iters=10):
    t0 = time.perf_counter(); out = fn(*args); jax.tree.map(np.asarray, out)
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.tree.map(np.asarray, out)
    return (time.perf_counter() - t0) / iters * 1000, cs

rng = np.random.default_rng(0)
from advancedliteratemachinery_tpu.models.lore import LORE, LoreConfig
m = LORE(LoreConfig())
v = jax.jit(lambda k: m.init_full(k, image_shape=(768, 768)))(jax.random.PRNGKey(0))
fi = jax.jit(lambda v, x: m.apply(v, x, method=m.infer))
Bs = [int(b) for b in os.environ.get("BS", "8").split(",")]
for B in Bs:
    x = jnp.asarray(rng.standard_normal((B, 768, 768, 3)), jnp.float32)
    ms, cs = timeit(fi, v, x)
    print(f"lore infer B{B} 768²: {ms:8.2f} ms  {ms/B:7.2f} ms/page → {1000*B/ms:6.1f} pages/s (compile {cs:.0f}s)", flush=True)
