import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/ns_tpu_jax_cache')
rng = np.random.default_rng(0)
T = 527232
N, W = 160256, 8
flat = jnp.asarray(rng.standard_normal(T + 1).astype(np.float32))
_ = float(flat[0])  # honest mode
idx = rng.integers(0, T, size=(N, W)).astype(np.int32)

def bench(name, fn, *args, n=50):
    f = jax.jit(fn); r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*args)
    jax.block_until_ready(r)
    print(f'{name:48s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms')
    return np.asarray(r)

g8 = jnp.asarray(idx)
r1 = bench('(N,8) gather + sum', lambda f, g: f[g].sum(1), flat, g8)
for width in [128, 512]:
    k = width // W
    g_wide = jnp.asarray(idx.reshape(N // k, width))
    def acc(f, g=g_wide, k=k, width=width):
        vals = f[g]                      # (N/k, width)
        return vals.reshape(-1, k, W).sum(-1).reshape(-1)
    r2 = bench(f'(N/{k},{width}) gather + grouped sum', acc, flat)
    print('   match:', np.allclose(r2, r1.reshape(-1), atol=1e-5))
# 2D table variant: flat as (T/128,128), gather whole rows by row id? different semantics; skip
