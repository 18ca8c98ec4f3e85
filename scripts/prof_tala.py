import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update('jax_compilation_cache_dir', '/tmp/ns_tpu_jax_cache')
rng = np.random.default_rng(0)

R, M = 4096, 8192  # table rows, gather rows
table = jnp.asarray(rng.standard_normal((R, 128)).astype(np.float32))
_ = float(table[0, 0])  # honest mode
idx = jnp.asarray(rng.integers(0, R, size=(M, 128)).astype(np.int32))

def k_tala(idx_ref, tab_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

def run(f, g):
    return pl.pallas_call(
        k_tala,
        out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(g, f)

try:
    r = jax.jit(run)(table, idx)
    jax.block_until_ready(r)
    ref = np.take_along_axis(np.asarray(table), np.asarray(idx), axis=0)
    print('correct:', np.allclose(np.asarray(r), ref))
    t0 = time.perf_counter()
    for _ in range(100): r = jax.jit(run)(table, idx)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 100
    print(f'pallas per-lane gather {M}x128 rows: {dt*1e3:.3f} ms = {M/dt/1e9:.2f} Grows/s')
except Exception as e:
    import traceback; traceback.print_exc()
