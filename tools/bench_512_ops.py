"""Standalone op rates at the 512px/161f (5376-token) DiT shapes.

Measures each hot op of the quantized long-context block in isolation so
the step-time audit (tools/perf_512.py) can be decomposed into per-op
floors: the W8A8 Pallas matmuls, the blocked bounded-logit flash
attention, and the fused quant producers. Sums them into an achievable
step floor to compare against the measured dit_step_ms.

Timing: each op runs ITERS times inside ONE jitted lax.scan reduced to a
scalar — the TPU core executes programs serially, so scan-time/ITERS is
device op time. (block_until_ready and bulk fetches are unreliable/slow
through the axon tunnel; see CLAUDE.md.)  The loop carry is threaded into
one float input of the op and the next carry is taken from the op output,
so XLA can neither hoist the op out of the scan as loop-invariant nor
DCE it (an earlier version without this measured pure dispatch latency:
every op "took" 1.3 ms).  The ~26 ms host dispatch is measured with an
empty loop and subtracted.  Caveat: ops whose only float input is the
big activation pay one extra elementwise input-refresh pass (~the op's
own read bandwidth) — flagged with a trailing `+refresh`.
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
    """Wall seconds for one jitted scan of `body` over ITERS iterations."""

    @jax.jit
    def loop(*a):
        return jax.lax.scan(
            lambda c, _: (body(c, *a), None), jnp.float32(0), None,
            length=ITERS,
        )[0]

    float(loop(*args))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


_DISPATCH = [None]


def op_time(make_op, *args, perturb=None):
    """Seconds per op, dispatch-corrected.

    `perturb` = index of the float arg the carry is added to (default:
    the smallest float arg, to keep the refresh pass cheap).
    """
    if _DISPATCH[0] is None:
        _DISPATCH[0] = _loop_time(lambda c: c * 1.0000001 + 1.0)
    if perturb is None:
        fl = [i for i, a in enumerate(args)
              if jnp.issubdtype(a.dtype, jnp.floating)]
        perturb = min(fl, key=lambda i: args[i].size)

    def body(c, *a):
        aa = list(a)
        aa[perturb] = aa[perturb] + (c * 1e-30).astype(aa[perturb].dtype)
        out = make_op(*aa)
        return c * 0.5 + jnp.sum(out.astype(jnp.float32).ravel()[:128]) * 1e-30

    t = max(_loop_time(body, *args) - _DISPATCH[0], 0.0) / ITERS
    refresh = args[perturb].size >= 1_000_000
    return t, refresh


def main():
    from avatar_tpu.ops.flash_attention import flash_attention
    from avatar_tpu.ops.int8_matmul import (fused_act_quant,
                                            fused_rms_mod_quant,
                                            quantize_rows_pallas, w8a8_matmul)

    key = jax.random.PRNGKey(0)
    rows = {}

    for name, (k, n) in (("qkvo_2048x2048", (INNER, INNER)),
                         ("qkv_2048x6144", (INNER, 3 * INNER)),
                         ("ff_in_2048x8192", (INNER, FF)),
                         ("ff_out_8192x2048", (FF, INNER))):
        x = jax.random.normal(key, (M, k), jnp.bfloat16)
        xq, xs = quantize_rows_pallas(x)
        wq = jax.random.randint(key, (k, n), -127, 127, jnp.int8)
        ws = jnp.ones((n,), jnp.float32)
        t, r = op_time(w8a8_matmul, xq, xs, wq, ws)
        rows[name] = {"ms": t * 1e3, "tops": 2 * M * k * n / t / 1e12,
                      "refresh": r}

    x3 = jax.random.normal(key, (1, M, INNER), jnp.bfloat16)
    cvec = jax.random.normal(key, (1, 1, INNER), jnp.bfloat16)
    t, r = op_time(lambda a, b: fused_rms_mod_quant(a, b, b).q, x3, cvec)
    rows["fused_rms_mod_quant"] = {"ms": t * 1e3, "refresh": r}
    h = jax.random.normal(key, (1, M, FF), jnp.bfloat16)
    t, r = op_time(lambda a: fused_act_quant(a).q, h)
    rows["fused_act_quant_8192"] = {"ms": t * 1e3, "refresh": r}
    x2 = jax.random.normal(key, (M, INNER), jnp.bfloat16)
    t, r = op_time(lambda a: quantize_rows_pallas(a)[0], x2)
    rows["quantize_rows_2048"] = {"ms": t * 1e3, "refresh": r}

    q = jax.random.normal(key, (1, 32, M, 64), jnp.bfloat16)
    t, r = op_time(lambda a: flash_attention(a, a, a, bounded_logits=True), q)
    attn_flops = 2 * 2 * M * M * INNER
    rows["self_attn_5376"] = {"ms": t * 1e3, "tfs": attn_flops / t / 1e12,
                              "refresh": r}
    kv = jax.random.normal(key, (1, 32, CROSS, 64), jnp.bfloat16)
    t, r = op_time(
        lambda a, b: flash_attention(a, b, b, bounded_logits=True), q, kv
    )
    rows["cross_attn_5376x256"] = {"ms": t * 1e3, "refresh": r}

    for k_, v in rows.items():
        extra = "".join(
            f"  {kk}={vv:.1f}" for kk, vv in v.items()
            if kk not in ("ms", "refresh")
        )
        tail = "  +refresh" if v.get("refresh") else ""
        print(f"{k_:24s} {v['ms']:7.3f} ms{extra}{tail}", flush=True)

    # per block (split-rope layout, cross kv hoisted):
    #   attn1 qkv (2048x6144) + attn1 out + attn2 q + attn2 out  (2048x2048)
    #   ff in (2048x8192) + ff out (8192x2048)
    #   producers: 2x fused_rms_mod_quant (pre-attn1/pre-ff),
    #   1x fused_act_quant (ff mid), 2x quantize_rows (attn1 out, attn2 out)
    per_block = (rows["qkv_2048x6144"]["ms"]
                 + 3 * rows["qkvo_2048x2048"]["ms"]
                 + rows["ff_in_2048x8192"]["ms"]
                 + rows["ff_out_8192x2048"]["ms"]
                 + rows["self_attn_5376"]["ms"]
                 + rows["cross_attn_5376x256"]["ms"]
                 + 2 * rows["fused_rms_mod_quant"]["ms"]
                 + rows["fused_act_quant_8192"]["ms"]
                 + 2 * rows["quantize_rows_2048"]["ms"])
    print(f"\nper-block op sum: {per_block:.3f} ms -> 28 blocks: "
          f"{28 * per_block:.1f} ms/step (+ proj/rope/residual glue)",
          flush=True)


if __name__ == "__main__":
    main()
