"""Measure Pallas DMA efficiency: channel-group (strided) block reads from a
token-major [1, L, C] array vs contiguous reads from [G, L, width].

Decides whether the blocked rope-fused kernel's 9 TF/s is strided-DMA-bound,
and whether a fused rope+relayout pass would run near memory speed."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

L, C, WIDTH, BLK = 5376, 2048, 256, 896
G = C // WIDTH


def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def bench(name, fn, args, nbytes):
    jf = jax.jit(fn)
    float(jnp.sum(jf(*args)[0, :8, :8].astype(jnp.float32)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(jf(*args)[0, :8, :8].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{name:34s}: {dt*1e3:7.3f} ms  {nbytes/dt/1e9:6.1f} GB/s (r+w)", flush=True)


rng = np.random.default_rng(0)
x_tok = jnp.asarray(rng.standard_normal((1, L, C)), jnp.bfloat16)
x_grp = jnp.asarray(rng.standard_normal((G, L, WIDTH)), jnp.bfloat16)
nbytes = 2 * L * C * 2  # read + write

# 1) strided channel-group blocks from token-major
fn1 = pl.pallas_call(
    copy_kernel,
    grid=(G, L // BLK),
    in_specs=[pl.BlockSpec((1, BLK, WIDTH), lambda g, i: (0, i, g),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, BLK, WIDTH), lambda g, i: (g, i, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((G, L, WIDTH), x_tok.dtype),
)
bench("strided group read -> contig", lambda x: fn1(x), (x_tok,), nbytes)

# 2) contiguous blocks from group-major (control)
fn2 = pl.pallas_call(
    copy_kernel,
    grid=(G, L // BLK),
    in_specs=[pl.BlockSpec((1, BLK, WIDTH), lambda g, i: (g, i, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, BLK, WIDTH), lambda g, i: (g, i, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((G, L, WIDTH), x_tok.dtype),
)
bench("contig read -> contig (control)", lambda x: fn2(x), (x_grp,), nbytes)

# 3) same strided read but revisited 6x (like the attention kernel's kv loop)
fn3 = pl.pallas_call(
    copy_kernel,
    grid=(G, L // BLK, L // BLK),
    in_specs=[pl.BlockSpec((1, BLK, WIDTH), lambda g, i, j: (0, j, g),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, BLK, WIDTH), lambda g, i, j: (g, i, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((G, L, WIDTH), x_tok.dtype),
)
bench("strided read x6 revisit", lambda x: fn3(x), (x_tok,), nbytes * 6)

# 4) XLA reshape/transpose relayout for comparison
def xla_relayout(x):
    return x.reshape(1, L, G, WIDTH).transpose(0, 2, 1, 3).reshape(G, L, WIDTH)
bench("xla transpose relayout", jax.jit(xla_relayout), (x_tok,), nbytes)
