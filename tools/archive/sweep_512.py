"""Block-size sweeps for the 512px/161f hot ops (5376 tokens).

Follows tools/bench_512_ops.py's carry-threaded scan timing (scan ITERS
applications inside one jit with the loop carry threaded through an input
so nothing hoists/DCEs; subtract an empty-loop dispatch baseline).

Sweeps:
  1. blocked bounded flash attention block_q x block_kv at L=5376
  2. w8a8_matmul bm x bn at the ff_in (2048->8192) and qkv (2048->6144)
     shapes
  3. fused_token_attention on the real cross shape (5376 q tokens, 256 kv)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

M, INNER, FF, CROSS = 5376, 2048, 8192, 256
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
    from avatar_tpu.ops.flash_attention import (flash_attention,
                                                fused_token_attention)
    from avatar_tpu.ops.int8_matmul import quantize_rows_pallas, w8a8_matmul

    key = jax.random.PRNGKey(0)

    q = jax.random.normal(key, (1, 32, M, 64), jnp.bfloat16)
    attn_flops = 2 * 2 * M * M * INNER
    print("== blocked bounded flash attention, L=5376 ==", flush=True)
    for bq in (672, 896, 1344):
        for bkv in (672, 896, 1344):
            try:
                t = op_time(
                    lambda a, bq=bq, bkv=bkv: flash_attention(
                        a, a, a, bounded_logits=True, block_q=bq,
                        block_kv=bkv),
                    q)
                print(f"  bq={bq:4d} bkv={bkv:4d}  {t*1e3:7.3f} ms  "
                      f"{attn_flops/t/1e12:6.1f} TF/s", flush=True)
            except Exception as e:
                print(f"  bq={bq:4d} bkv={bkv:4d}  failed: {str(e)[:90]}",
                      flush=True)

    print("== w8a8 matmul block sweep ==", flush=True)
    for name, (k_, n) in (("ff_in_2048x8192", (INNER, FF)),
                          ("qkv_2048x6144", (INNER, 3 * INNER)),
                          ("ff_out_8192x2048", (FF, INNER))):
        x = jax.random.normal(key, (M, k_), jnp.bfloat16)
        xq, xs = quantize_rows_pallas(x)
        wq = jax.random.randint(key, (k_, n), -127, 127, jnp.int8)
        ws = jnp.ones((n,), jnp.float32)
        for bm in (512, 672, 896, 1024):
            for bn in (256, 512, 1024):
                if bm * k_ > 4 * 2**21 or k_ * bn > 4 * 2**21:
                    continue  # x/w block > 4 MB int8: VMEM blowup
                try:
                    t = op_time(
                        lambda a, b, c, d, bm=bm, bn=bn: w8a8_matmul(
                            a, b, c, d, bm=bm, bn=bn),
                        xq, xs, wq, ws, perturb=1)
                    print(f"  {name} bm={bm:4d} bn={bn:4d}  {t*1e3:7.3f} ms"
                          f"  {2*M*k_*n/t/1e12:6.1f} TOP/s", flush=True)
                except Exception as e:
                    print(f"  {name} bm={bm:4d} bn={bn:4d}  failed: "
                          f"{str(e)[:90]}", flush=True)

    print("== cross attention (pipeline path) ==", flush=True)
    qt = jax.random.normal(key, (1, M, INNER), jnp.bfloat16)
    kvt = jax.random.normal(key, (1, CROSS, INNER), jnp.bfloat16)
    cross_flops = 2 * 2 * M * CROSS * INNER
    t = op_time(
        lambda a, b: fused_token_attention(a, b, b, None, 32, 64**-0.5, True),
        qt, kvt, perturb=1)
    print(f"  fused_token 5376x256   {t*1e3:7.3f} ms  "
          f"{cross_flops/t/1e12:6.1f} TF/s", flush=True)
    t = op_time(
        lambda a, b: flash_attention(
            a.reshape(1, M, 32, 64).transpose(0, 2, 1, 3),
            b.reshape(1, CROSS, 32, 64).transpose(0, 2, 1, 3),
            b.reshape(1, CROSS, 32, 64).transpose(0, 2, 1, 3),
            bounded_logits=True),
        qt, kvt, perturb=1)
    print(f"  blocked+relayout       {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
