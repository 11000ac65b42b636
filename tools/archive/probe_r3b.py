"""Probe: wide-kv attention blocks + fused_act_quant rate at 512px shapes."""
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
    from avatar_tpu.ops.int8_matmul import fused_act_quant

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, 32, M, 64), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 32, M, 64), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 32, M, 64), jnp.bfloat16)
    attn_flops = 2 * 2 * M * M * INNER
    print("== wide blocks, L=5376 ==", flush=True)
    for bq, bkv in ((1344, 2688), (896, 5376), (448, 2688), (896, 1792),
                    (1792, 2688), (2688, 896), (896, 2688)):
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

    print("== fused_act_quant 5376x8192 ==", flush=True)
    h = jax.random.normal(key, (1, M, FF), jnp.bfloat16)
    t = op_time(lambda a: fused_act_quant(a).q, h)
    bytes_min = M * FF * (2 + 1)  # bf16 read + int8 write (scales tiny)
    print(f"  {t*1e3:7.3f} ms  ({bytes_min/t/1e9:6.1f} GB/s eff, "
          f"floor ~{bytes_min/819e9*1e3:5.3f} ms @ 819 GB/s)  +refresh "
          f"(~{M*FF*2*2/819e9*1e3:5.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
