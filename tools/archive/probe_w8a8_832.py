"""Probe: Pallas w8a8_matmul vs XLA int8 dot at 256px DiT shapes (M=832).

CLAUDE.md round-2 note kept the plain XLA dot at 832 tokens ("XLA's fusion
wins"); the Pallas kernel's blocks were retuned in round 3 — recheck.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = 1000
M = 832


def _loop_time(body, *args):
    @jax.jit
    def loop(*a):
        return jax.lax.scan(
            lambda c, _: (body(c, *a), None), jnp.float32(0), None,
            length=ITERS,
        )[0]

    float(loop(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


_DISPATCH = [None]


def op_time(make_op, *args):
    if _DISPATCH[0] is None:
        _DISPATCH[0] = _loop_time(lambda c: c * 1.0000001 + 1.0)

    def body(c, *a):
        aa = list(a)
        aa[0] = aa[0] + (c * 1e-30).astype(aa[0].dtype)
        out = make_op(*aa)
        return c * 0.5 + jnp.sum(out.astype(jnp.float32).ravel()[:128]) * 1e-30

    return max(_loop_time(body, *args) - _DISPATCH[0], 0.0) / ITERS


def main():
    from avatar_tpu.ops.int8_matmul import quantize_rows_pallas, w8a8_matmul

    key = jax.random.PRNGKey(0)
    for n, k in ((6144, 2048), (2048, 2048), (8192, 2048), (2048, 8192)):
        x = jax.random.normal(key, (M, k), jnp.bfloat16)
        wq = jax.random.randint(jax.random.PRNGKey(1), (k, n), -127, 127,
                                jnp.int8)
        wscale = jnp.ones((n,), jnp.float32) * 0.02
        flops = 2 * M * k * n

        def xla_path(xx):
            # act quant + int8 dot + dequant, all left to XLA (current
            # 256px routing)
            amax = jnp.max(jnp.abs(xx.astype(jnp.float32)), axis=-1,
                           keepdims=True)
            s = jnp.maximum(amax / 127.0, 1e-8)
            q = jnp.round(xx.astype(jnp.float32) / s).astype(jnp.int8)
            acc = jax.lax.dot_general(
                q, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * s * wscale).astype(jnp.bfloat16)

        def pallas_path(xx):
            q, sc = quantize_rows_pallas(xx)
            return w8a8_matmul(q, sc, wq, wscale, out_dtype=jnp.bfloat16)

        try:
            t_x = op_time(xla_path, x)
            t_p = op_time(pallas_path, x)
            print(f"k={k:5d} n={n:5d}: xla {t_x*1e6:7.1f} us "
                  f"({flops/t_x/1e12:5.1f} TOP/s)  pallas {t_p*1e6:7.1f} us "
                  f"({flops/t_p/1e12:5.1f} TOP/s)", flush=True)
        except Exception as e:
            print(f"k={k} n={n}: failed {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
