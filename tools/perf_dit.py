"""DiT step perf ablation on the real chip.

Times the full 2B dit_apply at the bench operating point (B=1, N=832 tokens,
bf16) plus component ablations to locate the bandwidth bloat (round-1 finding:
33 ms/step vs 14.6 ms compute roofline, 28.9 GB bytes-accessed vs ~4 GB
irreducible weight+activation traffic).

Usage: python tools/perf_dit.py [--variant all]
"""

import argparse
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from avatar_tpu.models.dit import DiTConfig, init_dit, dit_apply, _block_apply
from avatar_tpu.ops.rope import precompute_freqs_cis


def timed(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    # fetch a scalar to force through the tunnel
    float(jnp.sum(jax.tree.leaves(r)[0][..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jnp.sum(jax.tree.leaves(r)[0][..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return c.get("flops", 0) / 1e12, c.get("bytes accessed", 0) / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="flash")
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    cfg = DiTConfig()
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_dit(jax.random.PRNGKey(0), cfg)
    )
    b, n = args.batch, 832
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (b, n, cfg.in_channels), dtype=jnp.bfloat16)
    grid = jnp.stack(
        jnp.meshgrid(
            jnp.arange(13.0), jnp.arange(8.0), jnp.arange(8.0), indexing="ij"
        )
    ).reshape(3, -1)[None].repeat(b, 0)
    t = jnp.full((b,), 0.5, dtype=jnp.bfloat16)
    embeds = jax.random.normal(key, (b, 256, 4096), dtype=jnp.bfloat16)
    mask = jnp.ones((b, 256))

    impl = args.impl

    def full(params, x, t, embeds, mask):
        return dit_apply(params, cfg, x, grid, t, embeds, mask,
                         attention_impl=impl)

    full_j = jax.jit(full)
    dt = timed(full_j, params, x, t, embeds, mask)
    fl, byt = cost(full, params, x, t, embeds, mask)
    print(f"full dit_apply[{impl}] b={b}: {dt*1e3:.2f} ms  "
          f"{fl:.2f} TFLOP ({fl/dt:.0f} TF/s)  {byt:.1f} GB ({byt/dt:.0f} GB/s)")

    # -- single block scanned 28x (isolates block cost from entry/exit) --
    inner = cfg.inner_dim
    h = jax.random.normal(key, (b, n, inner), dtype=jnp.bfloat16)
    freqs = precompute_freqs_cis(
        grid, dim=inner, theta=cfg.positional_embedding_theta,
        max_pos=cfg.positional_embedding_max_pos, out_dtype=jnp.bfloat16,
    )
    ada = jax.random.normal(key, (b, 1, 6 * inner), dtype=jnp.bfloat16)
    eh = jax.random.normal(key, (b, 256, inner), dtype=jnp.bfloat16)
    bp = params["blocks"][0]

    def scan28(bp, h):
        def body(hh, _):
            return _block_apply(
                bp, hh, cfg, freqs, ada, eh, mask, None, None,
                attention_impl=impl,
            ), None
        out, _ = jax.lax.scan(body, h, None, length=28)
        return out

    dt = timed(jax.jit(scan28), bp, h)
    fl, byt = cost(scan28, bp, h)
    print(f"block x28 [{impl}]: {dt*1e3:.2f} ms  {fl:.2f} TFLOP ({fl/dt:.0f} TF/s)"
          f"  {byt:.1f} GB ({byt/dt:.0f} GB/s)")

    # -- component ablations inside a scanned block --
    from avatar_tpu.models.dit import _attention, _feed_forward, _std_norm
    from avatar_tpu.ops.normalization import layer_norm

    def attn1_only(bp, h):
        def body(hh, _):
            return hh + _attention(bp["attn1"], hh, cfg, freqs_cis=freqs,
                                   attention_impl=impl), None
        return jax.lax.scan(body, h, None, length=28)[0]

    def attn2_only(bp, h):
        def body(hh, _):
            return hh + _attention(bp["attn2"], hh, cfg,
                                   encoder_hidden_states=eh, kv_mask=mask,
                                   attention_impl=impl), None
        return jax.lax.scan(body, h, None, length=28)[0]

    def ff_only(bp, h):
        def body(hh, _):
            return hh + _feed_forward(bp["ff"], hh, cfg), None
        return jax.lax.scan(body, h, None, length=28)[0]

    def norms_only(bp, h):
        def body(hh, _):
            nx = _std_norm(bp.get("norm1"), hh, cfg)
            a = bp["scale_shift_table"].astype(hh.dtype)[None, None] + \
                ada.reshape(b, 1, 6, -1)
            nx = nx * (1 + a[:, :, 1]) + a[:, :, 0]
            nx = _std_norm(bp.get("norm2"), nx, cfg)
            nx = nx * (1 + a[:, :, 4]) + a[:, :, 3]
            return hh + 0.001 * nx, None
        return jax.lax.scan(body, h, None, length=28)[0]

    for name, fn in [("attn1", attn1_only), ("attn2", attn2_only),
                     ("ff", ff_only), ("norms", norms_only)]:
        dt = timed(jax.jit(fn), bp, h)
        fl, byt = cost(fn, bp, h)
        print(f"{name} x28 [{impl}]: {dt*1e3:.2f} ms  {fl:.2f} TFLOP "
              f"({fl/max(dt,1e-9):.0f} TF/s)  {byt:.1f} GB ({byt/dt:.0f} GB/s)")

    # -- pure matmul ceiling: the block's 7 matmuls, no norms/attention --
    def matmuls_only(bp, h):
        def body(hh, _):
            q = hh @ bp["attn1"]["to_q"]["kernel"]
            k = hh @ bp["attn1"]["to_k"]["kernel"]
            v = hh @ bp["attn1"]["to_v"]["kernel"]
            o = (q + k + v) @ bp["attn1"]["to_out"]["kernel"]
            q2 = o @ bp["attn2"]["to_q"]["kernel"]
            k2 = eh @ bp["attn2"]["to_k"]["kernel"]
            v2 = eh @ bp["attn2"]["to_v"]["kernel"]
            o2 = (q2 + k2.sum(1, keepdims=True) + v2.sum(1, keepdims=True)) \
                @ bp["attn2"]["to_out"]["kernel"]
            f1 = o2 @ bp["ff"]["proj_in"]["kernel"]
            f2 = jax.nn.gelu(f1, approximate=True) @ bp["ff"]["proj_out"]["kernel"]
            return hh + f2, None
        return jax.lax.scan(body, h, None, length=28)[0]

    dt = timed(jax.jit(matmuls_only), bp, h)
    fl, byt = cost(matmuls_only, bp, h)
    print(f"matmuls x28: {dt*1e3:.2f} ms  {fl:.2f} TFLOP ({fl/dt:.0f} TF/s)"
          f"  {byt:.1f} GB ({byt/dt:.0f} GB/s)")


def _unused():
    main()


def opt_experiments(args):
    """Optimized-block prototypes: merged qkv, hoisted cross-kv."""
    import functools
    from avatar_tpu.models.dit import _qk_norm, _std_norm, _feed_forward
    from avatar_tpu.ops.attention import scaled_dot_product_attention
    from avatar_tpu.ops.rope import apply_rotary_emb

    cfg = DiTConfig()
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_dit(jax.random.PRNGKey(0), cfg)
    )
    b, n = args.batch, 832
    key = jax.random.PRNGKey(1)
    inner = cfg.inner_dim
    h = jax.random.normal(key, (b, n, inner), dtype=jnp.bfloat16)
    grid = jnp.stack(
        jnp.meshgrid(jnp.arange(13.0), jnp.arange(8.0), jnp.arange(8.0),
                     indexing="ij")
    ).reshape(3, -1)[None].repeat(b, 0)
    freqs = precompute_freqs_cis(
        grid, dim=inner, theta=cfg.positional_embedding_theta,
        max_pos=cfg.positional_embedding_max_pos, out_dtype=jnp.bfloat16,
    )
    ada = jax.random.normal(key, (b, 1, 6 * inner), dtype=jnp.bfloat16)
    eh = jax.random.normal(key, (b, 256, inner), dtype=jnp.bfloat16)
    mask = jnp.ones((b, 256))
    bp = params["blocks"][0]

    # merged qkv kernel
    wqkv = jnp.concatenate([
        bp["attn1"]["to_q"]["kernel"], bp["attn1"]["to_k"]["kernel"],
        bp["attn1"]["to_v"]["kernel"]], axis=1)
    bqkv = jnp.concatenate([
        bp["attn1"]["to_q"]["bias"], bp["attn1"]["to_k"]["bias"],
        bp["attn1"]["to_v"]["bias"]])
    # hoisted cross kv
    k2 = _qk_norm(bp["attn2"].get("k_norm"),
                  eh @ bp["attn2"]["to_k"]["kernel"] + bp["attn2"]["to_k"]["bias"], cfg)
    v2 = eh @ bp["attn2"]["to_v"]["kernel"] + bp["attn2"]["to_v"]["bias"]
    heads, hd = cfg.num_attention_heads, cfg.attention_head_dim

    def split(t):
        return t.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)

    k2s, v2s = split(k2), split(v2)
    impl = args.impl

    def opt_block(bp, hh):
        a = bp["scale_shift_table"].astype(hh.dtype)[None, None] + \
            ada.reshape(b, 1, 6, -1)
        nx = _std_norm(None, hh, cfg)
        nx = nx * (1 + a[:, :, 1]) + a[:, :, 0]
        qkv = nx @ wqkv + bqkv
        q, kk, vv = jnp.split(qkv, 3, axis=-1)
        q = _qk_norm(bp["attn1"].get("q_norm"), q, cfg)
        kk = _qk_norm(bp["attn1"].get("k_norm"), kk, cfg)
        q = apply_rotary_emb(q, freqs)
        kk = apply_rotary_emb(kk, freqs)
        o = scaled_dot_product_attention(split(q), split(kk), split(vv),
                                         impl=impl)
        o = o.transpose(0, 2, 1, 3).reshape(b, -1, inner).astype(hh.dtype)
        o = o @ bp["attn1"]["to_out"]["kernel"] + bp["attn1"]["to_out"]["bias"]
        hh = hh + a[:, :, 2] * o
        q2 = _qk_norm(bp["attn2"].get("q_norm"),
                      hh @ bp["attn2"]["to_q"]["kernel"] + bp["attn2"]["to_q"]["bias"], cfg)
        o2 = scaled_dot_product_attention(split(q2), k2s, v2s, mask=mask,
                                          impl=impl)
        o2 = o2.transpose(0, 2, 1, 3).reshape(b, -1, inner).astype(hh.dtype)
        o2 = o2 @ bp["attn2"]["to_out"]["kernel"] + bp["attn2"]["to_out"]["bias"]
        hh = hh + o2
        nx = _std_norm(None, hh, cfg)
        nx = nx * (1 + a[:, :, 4]) + a[:, :, 3]
        ff = _feed_forward(bp["ff"], nx, cfg)
        return hh + a[:, :, 5] * ff

    def scan28(bp, hh):
        def body(c, _):
            return opt_block(bp, c), None
        return jax.lax.scan(body, hh, None, length=28)[0]

    dt = timed(jax.jit(scan28), bp, h)
    fl, byt = cost(scan28, bp, h)
    print(f"OPT block x28 [{impl}] b={b}: {dt*1e3:.2f} ms  "
          f"{fl*28:.2f} TFLOP ({fl*28/dt:.0f} TF/s)  {byt*28:.1f} GB")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="flash")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--mode", default="main")
    a = ap.parse_args()
    if a.mode == "opt":
        opt_experiments(a)
    else:
        main()
