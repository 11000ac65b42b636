"""One-off round-3 probe: attention rate recheck + ff_out block sweep.

Same carry-threaded scan timing as tools/bench_512_ops.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

M, INNER, FF = 5376, 2048, 8192
ITERS = 500


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


def op_time(make_op, *args, perturb=0):
    if _DISPATCH[0] is None:
        _DISPATCH[0] = _loop_time(lambda c: c * 1.0000001 + 1.0)

    def body(c, *a):
        aa = list(a)
        aa[perturb] = aa[perturb] + (c * 1e-30).astype(aa[perturb].dtype)
        out = make_op(*aa)
        return c * 0.5 + jnp.sum(out.astype(jnp.float32).ravel()[:128]) * 1e-30

    return max(_loop_time(body, *args) - _DISPATCH[0], 0.0) / ITERS


def main():
    from avatar_tpu.ops.flash_attention import flash_attention
    from avatar_tpu.ops.int8_matmul import quantize_rows_pallas, w8a8_matmul

    key = jax.random.PRNGKey(0)

    q = jax.random.normal(key, (1, 32, M, 64), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 32, M, 64), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 32, M, 64), jnp.bfloat16)
    attn_flops = 2 * 2 * M * M * INNER
    print("== blocked bounded flash attention, L=5376 (current code) ==",
          flush=True)
    for bq, bkv in ((896, 896), (896, 1344), (1344, 896), (1344, 1344),
                    (896, 2688), (1792, 896), (672, 2688)):
        try:
            t = op_time(
                lambda a, b, c, bq=bq, bkv=bkv: flash_attention(
                    a, b, c, bounded_logits=True, block_q=bq, block_kv=bkv),
                q, k, v)
            print(f"  bq={bq:4d} bkv={bkv:4d}  {t*1e3:7.3f} ms  "
                  f"{attn_flops/t/1e12:6.1f} TF/s", flush=True)
        except Exception as e:
            print(f"  bq={bq:4d} bkv={bkv:4d}  failed: {str(e)[:90]}",
                  flush=True)
    # default block pick
    t = op_time(lambda a, b, c: flash_attention(a, b, c, bounded_logits=True),
                q, k, v)
    print(f"  default            {t*1e3:7.3f} ms  "
          f"{attn_flops/t/1e12:6.1f} TF/s", flush=True)

    print("== ff_out 8192x2048 w8a8 small-bm sweep ==", flush=True)
    x = jax.random.normal(key, (M, FF), jnp.bfloat16)
    xq, xs = quantize_rows_pallas(x)
    wq = jax.random.randint(key, (FF, INNER), -127, 127, jnp.int8)
    ws = jnp.ones((INNER,), jnp.float32)
    t = op_time(lambda a, b, c, d: w8a8_matmul(a, b, c, d),
                xq, xs, wq, ws, perturb=1)
    print(f"  default           {t*1e3:7.3f} ms  "
          f"{2*M*FF*INNER/t/1e12:6.1f} TOP/s", flush=True)
    for bm in (128, 192, 256, 336, 448):
        for bn in (512, 1024, 2048):
            try:
                t = op_time(
                    lambda a, b, c, d, bm=bm, bn=bn: w8a8_matmul(
                        a, b, c, d, bm=bm, bn=bn),
                    xq, xs, wq, ws, perturb=1)
                print(f"  bm={bm:4d} bn={bn:4d}  {t*1e3:7.3f} ms"
                      f"  {2*M*FF*INNER/t/1e12:6.1f} TOP/s", flush=True)
            except Exception as e:
                print(f"  bm={bm:4d} bn={bn:4d}  failed: {str(e)[:90]}",
                      flush=True)


if __name__ == "__main__":
    main()
