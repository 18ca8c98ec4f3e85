import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update('jax_compilation_cache_dir', '/tmp/ns_tpu_jax_cache')
rng = np.random.default_rng(0)

for R in [1024, 2048]:
    table = jnp.asarray(rng.standard_normal((R, 128)).astype(np.float32))
    _ = float(table[0, 0])
    idx = jnp.asarray(rng.integers(0, R, size=(R, 128)).astype(np.int32))

    def k(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    def run(g, f):
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(g, f)

    try:
        fj = jax.jit(run)
        r = fj(idx, table); jax.block_until_ready(r)
        ref = np.take_along_axis(np.asarray(table), np.asarray(idx), axis=0)
        ok = np.allclose(np.asarray(r), ref)
        t0 = time.perf_counter()
        for _ in range(100): r = fj(idx, table)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / 100
        print(f'R={R}: correct={ok}  {dt*1e3:.3f} ms  {R*128/dt/1e9:.2f} Gelem/s  ({R/dt/1e6:.1f} Mrows/s)')
    except Exception as e:
        print(f'R={R}: FAILED {str(e)[:150]}')
