"""Unit tests for core ops: attention (incl. Pallas kernel in interpret mode),
causal conv3d vs a torch oracle, RoPE, normalization, pixel shuffle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avatar_tpu.ops import (
    apply_rotary_emb,
    causal_conv3d,
    layer_norm,
    pixel_norm,
    pixel_shuffle_3d,
    pixel_unshuffle_3d,
    patchify_pixels,
    unpatchify_pixels,
    precompute_freqs_cis,
    rms_norm,
    scaled_dot_product_attention,
)
from avatar_tpu.ops.attention import xla_attention
from avatar_tpu.ops.flash_attention import flash_attention
from avatar_tpu.ops.rope import get_latent_coords


def _np_attention(q, k, v, keep_mask=None, scale=None):
    q, k, v = [np.asarray(t, dtype=np.float64) for t in (q, k, v)]
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if keep_mask is not None:
        s = np.where(keep_mask[:, None, None, :] > 0.5, s, -1e30)
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("masked", [False, True])
def test_xla_attention_matches_numpy(rng, masked):
    q = rng.standard_normal((2, 3, 40, 16)).astype(np.float32)
    k = rng.standard_normal((2, 3, 24, 16)).astype(np.float32)
    v = rng.standard_normal((2, 3, 24, 16)).astype(np.float32)
    mask = (rng.random((2, 24)) > 0.3).astype(np.float32) if masked else None
    out = scaled_dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        mask=None if mask is None else jnp.asarray(mask), impl="xla",
    )
    ref = _np_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


@pytest.mark.parametrize("lq,lk", [(256, 256), (250, 130), (384, 256)])
def test_flash_attention_interpret_matches_xla(rng, lq, lk):
    """Pallas kernel in interpreter mode (CPU) vs the XLA path, with masks
    and non-block-multiple lengths (the wrapper must pad internally)."""
    q = jnp.asarray(rng.standard_normal((2, 2, lq, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 2, lk, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 2, lk, 32)).astype(np.float32))
    mask = jnp.asarray((rng.random((2, lk)) > 0.25).astype(np.float32))
    out_f = flash_attention(q, k, v, kv_mask=mask, block_q=128, block_kv=128)
    out_x = xla_attention(
        q, k, v, jnp.where(mask[:, None, None, :] > 0.5, 0.0, -1e30)
    )
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), atol=2e-5)


def test_flash_attention_grad(rng):
    q = jnp.asarray(rng.standard_normal((1, 2, 128, 32)).astype(np.float32))

    def loss_flash(q):
        return jnp.sum(flash_attention(q, q * 0.5, q * 0.2, block_q=128, block_kv=128) ** 2)

    def loss_xla(q):
        return jnp.sum(xla_attention(q, q * 0.5, q * 0.2) ** 2)

    g_f = jax.grad(loss_flash)(q)
    g_x = jax.grad(loss_xla)(q)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x), atol=1e-4)


def test_causal_conv3d_matches_torch(rng):
    """lax conv in NDHWC vs torch Conv3d oracle, causal + strided."""
    torch = pytest.importorskip("torch")

    b, f, h, w, cin, cout = 2, 9, 8, 8, 4, 6
    x = rng.standard_normal((b, f, h, w, cin)).astype(np.float32)
    wgt = rng.standard_normal((cout, cin, 3, 3, 3)).astype(np.float32) * 0.2
    bias = rng.standard_normal((cout,)).astype(np.float32)

    for stride, causal in [((1, 1, 1), True), ((2, 2, 2), True), ((1, 1, 1), False)]:
        # torch reference (reference CausalConv3d semantics)
        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        kt = 3
        if causal:
            pad = xt[:, :, :1].repeat(1, 1, kt - 1, 1, 1)
            xt_p = torch.cat([pad, xt], dim=2)
        else:
            fpad = xt[:, :, :1].repeat(1, 1, (kt - 1) // 2, 1, 1)
            bpad = xt[:, :, -1:].repeat(1, 1, (kt - 1) // 2, 1, 1)
            xt_p = torch.cat([fpad, xt, bpad], dim=2)
        conv = torch.nn.Conv3d(cin, cout, 3, stride=stride, padding=(0, 1, 1))
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(wgt))
            conv.bias.copy_(torch.from_numpy(bias))
            ref = conv(xt_p).permute(0, 2, 3, 4, 1).numpy()

        kernel = jnp.asarray(wgt.transpose(2, 3, 4, 1, 0))  # OIDHW -> DHWIO
        out = causal_conv3d(
            jnp.asarray(x), kernel, jnp.asarray(bias),
            stride=stride, causal=causal,
        )
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_causal_conv3d_temporal_causality(rng):
    """Output frame t must not depend on input frames > t (stride 1)."""
    x = rng.standard_normal((1, 8, 4, 4, 3)).astype(np.float32)
    kernel = jnp.asarray(rng.standard_normal((3, 3, 3, 3, 5)).astype(np.float32))
    full = causal_conv3d(jnp.asarray(x), kernel)
    x2 = x.copy()
    x2[:, 5:] += 100.0  # perturb the future
    out2 = causal_conv3d(jnp.asarray(x2), kernel)
    np.testing.assert_allclose(np.asarray(full[:, :5]), np.asarray(out2[:, :5]), atol=1e-5)
    assert not np.allclose(np.asarray(full[:, 5:]), np.asarray(out2[:, 5:]))


def test_rope_shapes_and_values():
    """RoPE shape contract + rotation norm preservation."""
    coords = get_latent_coords(2, 3, 4, batch_size=2)
    assert coords.shape == (2, 3, 24)
    dim = 48  # divisible by 6
    cos, sin = precompute_freqs_cis(coords, dim=dim, max_pos=(20, 2048, 2048))
    assert cos.shape == (2, 24, dim) and sin.shape == (2, 24, dim)
    np.testing.assert_allclose(
        np.asarray(cos**2 + sin**2), np.ones((2, 24, dim)), atol=1e-5
    )
    x = jnp.ones((2, 24, dim))
    out = apply_rotary_emb(x, (cos, sin))
    assert out.shape == x.shape
    # t=y=x=0 token: fractional position 0 -> angle -indices*pi/2; nonzero rotation
    assert not np.allclose(np.asarray(out[0, 0]), np.asarray(x[0, 0]))


def test_rope_dim_padding():
    """dim % 6 != 0 pads cos with ones / sin with zeros at the front
    (transformer3d.py:272-276)."""
    coords = get_latent_coords(1, 2, 2, batch_size=1)
    dim = 2048  # 2048 % 6 == 2
    cos, sin = precompute_freqs_cis(coords, dim=dim)
    assert cos.shape[-1] == dim
    np.testing.assert_allclose(np.asarray(cos[..., :2]), 1.0)
    np.testing.assert_allclose(np.asarray(sin[..., :2]), 0.0)


def test_norms_match_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((2, 7, 24)).astype(np.float32)

    ln = torch.nn.LayerNorm(24, eps=1e-6, elementwise_affine=False)
    ref = ln(torch.from_numpy(x)).numpy()
    out = layer_norm(jnp.asarray(x), eps=1e-6)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    # rms_norm vs manual
    ref_rms = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(
        np.asarray(rms_norm(jnp.asarray(x), eps=1e-6)), ref_rms, atol=1e-5
    )

    # pixel_norm vs reference formula (eps 1e-8, channel axis)
    v = rng.standard_normal((2, 3, 4, 4, 8)).astype(np.float32)
    ref_pn = v / np.sqrt((v**2).mean(-1, keepdims=True) + 1e-8)
    np.testing.assert_allclose(
        np.asarray(pixel_norm(jnp.asarray(v))), ref_pn, atol=1e-5
    )


def test_pixel_shuffle_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 2, 4, 4, 24)).astype(np.float32))
    up = pixel_shuffle_3d(x, (2, 2, 2))
    assert up.shape == (2, 4, 8, 8, 3)
    back = pixel_unshuffle_3d(up, (2, 2, 2))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_patchify_pixels_roundtrip(rng):
    """Mirror of reference test_vae_patchify_unpatchify
    (causal_video_autoencoder.py:1334-1340), channels-last."""
    x = jnp.asarray(rng.standard_normal((2, 8, 64, 64, 3)).astype(np.float32))
    p = patchify_pixels(x, patch_size_hw=4, patch_size_t=4)
    assert p.shape == (2, 2, 16, 16, 3 * 64)
    back = unpatchify_pixels(p, patch_size_hw=4, patch_size_t=4)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_patchify_pixels_matches_torch_channel_order(rng):
    """The channels-last patchify must equal the reference NCFHW rearrange
    'b c (f p) (h q) (w r) -> b (c p r q) f h w' transposed to NDHWC."""
    from einops import rearrange

    x = rng.standard_normal((1, 4, 8, 8, 3)).astype(np.float32)
    x_ncfhw = x.transpose(0, 4, 1, 2, 3)
    ref = rearrange(
        x_ncfhw, "b c (f p) (h q) (w r) -> b (c p r q) f h w", p=1, q=4, r=4
    )
    ref = ref.transpose(0, 2, 3, 4, 1)
    out = patchify_pixels(jnp.asarray(x), patch_size_hw=4, patch_size_t=1)
    np.testing.assert_allclose(np.asarray(out), ref)


class TestFusedTokenAttention:
    """Token-major fused attention (ops/flash_attention.py) vs XLA oracle."""

    def _check(self, b, lq, lk, heads, hd, mask=None, dtype=jnp.float32):
        from avatar_tpu.ops.flash_attention import (
            fused_supports,
            fused_token_attention,
        )
        from avatar_tpu.ops.flash_attention import _fused_ref

        assert fused_supports(lq, lk, heads, hd, dtype)
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (b, lq, heads * hd), dtype=dtype)
        k = jax.random.normal(ks[1], (b, lk, heads * hd), dtype=dtype)
        v = jax.random.normal(ks[2], (b, lk, heads * hd), dtype=dtype)
        out = fused_token_attention(q, k, v, mask, heads, hd**-0.5)
        ref = _fused_ref(q, k, v, mask, heads, hd**-0.5)
        atol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
        np.testing.assert_allclose(
            np.asarray(out, dtype=np.float32),
            np.asarray(ref, dtype=np.float32), atol=atol,
        )

    def test_self_attention(self):
        self._check(2, 64, 64, 4, 16)

    def test_cross_attention(self):
        self._check(1, 128, 32, 4, 16)

    def test_kv_mask(self):
        mask = jnp.ones((2, 64)).at[:, 40:].set(0.0)
        self._check(2, 64, 64, 4, 16, mask=mask)

    def test_fully_masked_row_is_zero(self):
        from avatar_tpu.ops.flash_attention import fused_token_attention

        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        q = jax.random.normal(ks[0], (1, 16, 32))
        k = jax.random.normal(ks[1], (1, 16, 32))
        v = jax.random.normal(ks[2], (1, 16, 32))
        mask = jnp.zeros((1, 16))
        out = fused_token_attention(q, k, v, mask, 2, 4.0**-0.5)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_bf16(self):
        self._check(1, 32, 32, 2, 16, dtype=jnp.bfloat16)

    def test_grad_matches_xla(self):
        from avatar_tpu.ops.flash_attention import (
            fused_token_attention,
            _fused_ref,
        )

        ks = jax.random.split(jax.random.PRNGKey(2), 3)
        q = jax.random.normal(ks[0], (1, 32, 32))
        k = jax.random.normal(ks[1], (1, 32, 32))
        v = jax.random.normal(ks[2], (1, 32, 32))

        def loss_fused(q, k, v):
            return jnp.sum(fused_token_attention(q, k, v, None, 2, 0.25) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(_fused_ref(q, k, v, None, 2, 0.25) ** 2)

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestFlashBackwardHardening:
    """Blocked flash backward coverage (VERDICT round-1 item 4): separate
    q/k/v grads, kv masks incl. fully-masked rows, multi-block L > 512,
    bf16 inputs vs fp32 XLA oracle (ops/flash_attention.py:243-468)."""

    def _grads(self, fn, q, k, v, mask=None):
        def loss(q, k, v):
            out = fn(q, k, v)
            return jnp.sum((out.astype(jnp.float32)) ** 2)

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def _compare(self, lq, lk, block, mask=None, dtype=jnp.float32,
                 atol=2e-4):
        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        q = jax.random.normal(ks[0], (1, 2, lq, 32), dtype=dtype)
        k = jax.random.normal(ks[1], (1, 2, lk, 32), dtype=dtype)
        v = jax.random.normal(ks[2], (1, 2, lk, 32), dtype=dtype)

        gf = self._grads(
            lambda q, k, v: flash_attention(
                q, k, v, kv_mask=mask, block_q=block, block_kv=block
            ), q, k, v,
        )
        bias = None
        if mask is not None:
            bias = jnp.where(mask[:, None, None, :] > 0.5, 0.0, -1e30)
        q32, k32, v32 = (t.astype(jnp.float32) for t in (q, k, v))
        gx = self._grads(
            lambda q, k, v: xla_attention(q, k, v, bias), q32, k32, v32
        )
        for name, a, b in zip("qkv", gf, gx):
            np.testing.assert_allclose(
                np.asarray(a, dtype=np.float32), np.asarray(b), atol=atol,
                err_msg=f"d{name} mismatch (lq={lq}, lk={lk}, block={block})",
            )

    def test_separate_qkv_grads_single_block(self):
        self._compare(128, 128, 128)

    def test_multi_block_accumulation(self):
        # L > 512 with block 128 -> multiple q and kv blocks; exercises the
        # dk/dv scratch accumulation across inner grid steps
        self._compare(640, 640, 128)

    def test_cross_attention_grads(self):
        self._compare(256, 128, 128)

    def test_kv_mask_grads(self):
        mask = jnp.ones((1, 256)).at[:, 200:].set(0.0)
        self._compare(256, 256, 128, mask=mask)

    def test_fully_masked_rows_zero_grads(self):
        """All kv masked: output is 0, every grad must be exactly 0 (the
        LSE_MASKED sentinel keeps backward p == 0, no NaNs)."""
        ks = jax.random.split(jax.random.PRNGKey(4), 3)
        q = jax.random.normal(ks[0], (1, 2, 128, 32))
        k = jax.random.normal(ks[1], (1, 2, 128, 32))
        v = jax.random.normal(ks[2], (1, 2, 128, 32))
        mask = jnp.zeros((1, 128))
        gf = self._grads(
            lambda q, k, v: flash_attention(
                q, k, v, kv_mask=mask, block_q=128, block_kv=128
            ), q, k, v,
        )
        for g in gf:
            arr = np.asarray(g)
            assert np.isfinite(arr).all()
            np.testing.assert_allclose(arr, 0.0, atol=1e-7)

    def test_partial_block_fully_masked(self):
        """One kv BLOCK entirely masked while others live — the masked-block
        exp/NEG_INF path must not poison accumulation."""
        mask = jnp.ones((1, 384)).at[:, 128:256].set(0.0)
        self._compare(256, 384, 128, mask=mask)

    def test_bf16_grads_vs_fp32_oracle(self):
        self._compare(256, 256, 128, dtype=jnp.bfloat16, atol=5e-2)

    def test_bf16_masked_multiblock(self):
        mask = jnp.ones((1, 384)).at[:, 300:].set(0.0)
        self._compare(384, 384, 128, mask=mask, dtype=jnp.bfloat16,
                      atol=5e-2)


class TestRopeFusedAttention:
    """In-kernel RoPE attention vs the explicit rope + head-major + XLA
    reference path."""

    def _data(self, b, l, heads, hd, dtype=jnp.float32, key=5):
        from avatar_tpu.ops.rope import (
            get_latent_coords, precompute_freqs_cis, split_freqs,
        )

        c = heads * hd
        ks = jax.random.split(jax.random.PRNGKey(key), 3)
        q = jax.random.normal(ks[0], (b, l, c), dtype=dtype)
        k = jax.random.normal(ks[1], (b, l, c), dtype=dtype)
        v = jax.random.normal(ks[2], (b, l, c), dtype=dtype)
        grid = get_latent_coords(2, 4, l // 8, batch_size=b)
        cos, sin = split_freqs(precompute_freqs_cis(grid, dim=c))
        return q, k, v, cos.astype(dtype), sin.astype(dtype)

    @pytest.mark.parametrize("heads,hd", [(4, 16), (8, 32)])
    def test_matches_reference(self, heads, hd):
        from avatar_tpu.ops.flash_attention import (
            _rope_fused_ref,
            rope_fused_attention,
            rope_fused_supports,
        )

        b, l = 2, 64
        q, k, v, cos, sin = self._data(b, l, heads, hd)
        assert rope_fused_supports(l, heads, hd, q.dtype)
        out = rope_fused_attention(q, k, v, cos, sin, heads, hd**-0.5)
        ref = _rope_fused_ref(q, k, v, cos, sin, heads, hd**-0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_grads_match_reference(self):
        from avatar_tpu.ops.flash_attention import (
            _rope_fused_ref,
            rope_fused_attention,
        )

        q, k, v, cos, sin = self._data(1, 32, 4, 16)

        def loss(fn):
            return lambda q, k, v: jnp.sum(fn(q, k, v, cos, sin, 4, 0.25) ** 2)

        gk = jax.grad(loss(rope_fused_attention), argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss(_rope_fused_ref), argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-4)

    def test_dit_attention_equivalence_with_rope_kernel(self):
        """dit_apply with the rope-fused kernel path (impl='flash', CPU
        interpret) equals the xla path."""
        from avatar_tpu.models.dit import (
            DiTConfig, dit_apply, init_dit,
            permute_dit_params_for_split_rope,
        )
        from avatar_tpu.ops.rope import get_latent_coords

        cfg = DiTConfig(
            num_attention_heads=4, attention_head_dim=16, in_channels=16,
            out_channels=16, num_layers=2, cross_attention_dim=64,
            caption_channels=96,
        )
        params = init_dit(jax.random.PRNGKey(0), cfg)
        b, f, h, w = 1, 2, 4, 8
        tokens = jax.random.normal(jax.random.PRNGKey(1), (b, f * h * w, 16))
        grid = get_latent_coords(f, h, w, batch_size=b)
        text = jax.random.normal(jax.random.PRNGKey(2), (b, 16, 96))
        mask = jnp.ones((b, 16))
        t = jnp.asarray([0.5])
        base = dit_apply(params, cfg, tokens, grid, t, text, mask,
                         attention_impl="xla")
        p_split = permute_dit_params_for_split_rope(params, cfg)
        out = dit_apply(p_split, cfg, tokens, grid, t, text, mask,
                        attention_impl="flash", rope_split=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   atol=5e-5)


def test_rgb_to_yuv420_matches_cv2():
    """Device I420 conversion vs OpenCV's COLOR_RGB2YUV_I420."""
    cv2 = pytest.importorskip("cv2")

    from avatar_tpu.ops.color import rgb_to_yuv420

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (2, 16, 24, 3), dtype=np.uint8)
    ours = np.asarray(rgb_to_yuv420(jnp.asarray(rgb)))
    for f in range(rgb.shape[0]):
        ref = cv2.cvtColor(rgb[f], cv2.COLOR_RGB2YUV_I420)
        assert ours[f].shape == ref.shape
        # rounding in the subsample/quantize differs by at most 1 LSB
        diff = np.abs(ours[f].astype(int) - ref.astype(int))
        assert diff.max() <= 1, diff.max()
        # host round-trip decodes
        bgr = cv2.cvtColor(ours[f], cv2.COLOR_YUV2BGR_I420)
        assert bgr.shape == (16, 24, 3)


def test_w8a8_matmul_kernel():
    """Pallas W8A8 matmul (interpret mode) == XLA int8 dot + dequant
    epilogue, including bias fusion, ragged M, and both K regimes."""
    import jax
    import jax.numpy as jnp

    from avatar_tpu.ops.int8_matmul import quantize_rows, w8a8_matmul

    key = jax.random.PRNGKey(0)
    # bk forces the k-split accumulator kernel (the auto trigger needs
    # m>=2048/k>4096 — too slow for interpret mode, so force it here)
    for m, k, n, use_bias, bk in [(832, 256, 512, True, None),
                                  (100, 512, 256, False, None),
                                  (64, 1024, 128, True, None),
                                  (320, 2048, 128, True, 512),
                                  (100, 2048, 128, False, 512)]:
        kx, kw, kb = jax.random.split(jax.random.fold_in(key, m * n), 3)
        x = jax.random.normal(kx, (m, k), jnp.float32)
        w = jax.random.normal(kw, (k, n), jnp.float32)
        w_s = jnp.max(jnp.abs(w), axis=0) / 127.0
        w_q = jnp.round(w / w_s).astype(jnp.int8)
        bias = jax.random.normal(kb, (n,), jnp.float32) if use_bias else None

        x_q, x_s = quantize_rows(x)
        got = w8a8_matmul(x_q, x_s, w_q, w_s, bias=bias, bk=bk,
                          out_dtype=jnp.float32, interpret=True)
        acc = jax.lax.dot_general(x_q, w_q, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        want = acc.astype(jnp.float32) * x_s * w_s
        if bias is not None:
            want = want + bias
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-5)


def test_rope_custom_vjp_matches_autodiff():
    """apply_rotary_emb's orthogonal-rotation backward == plain autodiff of
    the rotation math for real (pair-repeated) freqs (ops/rope.py)."""
    from avatar_tpu.ops.rope import (
        _rot_pairs,
        apply_rotary_emb,
        get_latent_coords,
        precompute_freqs_cis,
    )

    grid = get_latent_coords(2, 2, 4, 1)
    cos, sin = precompute_freqs_cis(grid, dim=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 64))

    def f_ref(x):
        return jnp.sum(jnp.sin(x * cos + _rot_pairs(x) * sin) ** 2)

    def f_cv(x):
        return jnp.sum(jnp.sin(apply_rotary_emb(x, (cos, sin))) ** 2)

    assert float(jnp.max(jnp.abs(f_ref(x) - f_cv(x)))) < 1e-6
    g_ref = jax.grad(f_ref)(x)
    g_cv = jax.grad(f_cv)(x)
    np.testing.assert_allclose(np.asarray(g_cv), np.asarray(g_ref), atol=1e-6)


def test_w8a8_conv3d_params_dispatch():
    """conv3d_params consumes both full-precision and int8 conv dicts; the
    int8 path (dynamic per-tensor act quant + per-out-channel weight scales,
    ops/causal_conv3d.py) stays close to the fp conv, including stride,
    causal replicate pad, and the replicate spatial mode."""
    from avatar_tpu.ops.causal_conv3d import conv3d_params
    from avatar_tpu.utils.quantize import quantize_conv3d

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 5, 8, 8, 16)).astype(np.float32))
    p = {
        "kernel": jnp.asarray(
            rng.standard_normal((3, 3, 3, 16, 24)).astype(np.float32) * 0.2),
        "bias": jnp.asarray(rng.standard_normal(24).astype(np.float32)),
    }
    q = quantize_conv3d(p)
    assert q["kernel_q8"].dtype == jnp.int8 and q["scale"].shape == (24,)

    for kw in (
        dict(),
        dict(stride=(2, 2, 2)),
        dict(causal=False),
        dict(spatial_padding_mode="replicate"),
    ):
        ref = conv3d_params(p, x, **kw)
        out = conv3d_params(q, x, **kw)
        assert out.shape == ref.shape
        rel = float(jnp.mean(jnp.abs(out - ref)) /
                    (jnp.mean(jnp.abs(ref)) + 1e-8))
        assert rel < 0.03, (kw, rel)
    # zero input: finite output (bias only, no 0/0 in the act scale)
    z = conv3d_params(q, jnp.zeros_like(x))
    assert bool(jnp.all(jnp.isfinite(z)))


class TestBoundedFlash:
    """Max-free flash kernel for qk-normed (bounded-logit) attention
    (ops/flash_attention.py:_fwd_kernel_bounded): forward and grads must
    match the XLA oracle, including kv masks, fully-masked rows, and
    non-128-multiple lengths (padding)."""

    def _inputs(self, b=1, h=2, lq=384, lk=384, d=32, seed=0):
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        def rmsn(x):
            return x / jnp.sqrt(jnp.mean(x**2, -1, keepdims=True) + 1e-6)
        q = rmsn(jax.random.normal(ks[0], (b, h, lq, d)))
        k = rmsn(jax.random.normal(ks[1], (b, h, lk, d)))
        v = jax.random.normal(ks[2], (b, h, lk, d))
        return q, k, v

    def _xla(self, q, k, v, mask=None):
        from avatar_tpu.ops.attention import xla_attention
        bias = None
        if mask is not None:
            bias = jnp.where(mask > 0.5, 0.0, -1e30)[:, None, None, :]
        return xla_attention(q, k, v, bias, q.shape[-1] ** -0.5)

    def test_forward_multiblock(self):
        from avatar_tpu.ops.flash_attention import flash_attention
        q, k, v = self._inputs()
        out = flash_attention(q, k, v, block_q=128, block_kv=128,
                              bounded_logits=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(self._xla(q, k, v)), atol=2e-5)

    def test_forward_masked_and_padded(self):
        from avatar_tpu.ops.flash_attention import flash_attention
        # lengths not multiples of 128 exercise the pad path; one fully
        # masked row exercises the l == 0 guard
        q, k, v = self._inputs(lq=200, lk=333, seed=1)
        mask = (jax.random.uniform(jax.random.PRNGKey(7), (1, 333)) > 0.3)
        mask = mask.astype(jnp.float32)
        out = flash_attention(q, k, v, kv_mask=mask, block_q=128,
                              block_kv=128, bounded_logits=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(self._xla(q, k, v, mask)), atol=2e-5)

        zero_mask = jnp.zeros((1, 333))
        out0 = flash_attention(q, k, v, kv_mask=zero_mask, block_q=128,
                               block_kv=128, bounded_logits=True)
        assert bool(jnp.all(jnp.isfinite(out0)))
        np.testing.assert_allclose(np.asarray(out0), 0.0, atol=1e-6)

    def test_grads_match_oracle(self):
        from avatar_tpu.ops.flash_attention import flash_attention
        q, k, v = self._inputs(lq=256, lk=256, seed=2)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(
                q, k, v, block_q=128, block_kv=128, bounded_logits=True
            ) ** 2)

        def loss_xla(q, k, v):
            return jnp.sum(self._xla(q, k, v) ** 2)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5)

    def test_block_picker(self):
        from avatar_tpu.ops.flash_attention import _pick_block
        assert _pick_block(5376, 1024) == 896   # divides, no padding waste
        assert _pick_block(832, 1024) == 896    # pad 832 -> 896, one block
        assert _pick_block(4096, 1024) == 1024
        assert _pick_block(100, 1024) == 128


def test_quantize_rows_pallas_matches_jnp():
    """Single-pass Pallas row quantization == the jnp reference expression
    (ops/int8_matmul.py:quantize_rows_pallas), incl. ragged M and zero rows."""
    from avatar_tpu.ops.int8_matmul import quantize_rows_pallas

    x = jax.random.normal(jax.random.PRNGKey(0), (300, 512), jnp.bfloat16)
    x = x.at[7].set(0.0)  # zero row: scale floor, all-zero q
    xq, xs = quantize_rows_pallas(x, interpret=True)
    xf = x.astype(jnp.float32)
    s_ref = jnp.maximum(jnp.max(jnp.abs(xf), -1, keepdims=True),
                        1e-30) / 127.0
    q_ref = jnp.clip(jnp.round(xf / s_ref), -127, 127).astype(jnp.int8)
    assert xq.dtype == jnp.int8 and xs.shape == (300, 1)
    np.testing.assert_array_equal(np.asarray(xq), np.asarray(q_ref))
    np.testing.assert_allclose(np.asarray(xs), np.asarray(s_ref), rtol=0)
    assert bool(jnp.all(jnp.isfinite(xs)))


def test_fused_rms_mod_quant_matches_reference():
    """Fused rms-norm + AdaLN-modulate + row-quant Pallas pass
    (ops/int8_matmul.py:fused_rms_mod_quant) == the unfused f32 math,
    within one quant level (reduction-order rounding)."""
    from avatar_tpu.ops.int8_matmul import fused_rms_mod_quant

    b, n, c = 2, 300, 256
    eps = 1e-6
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k[0], (b, n, c), jnp.bfloat16)
    x = x.at[0, 7].set(0.0)  # zero row: scale floor, all-zero q
    cvec = 1.0 + 0.3 * jax.random.normal(k[1], (b, 1, c), jnp.bfloat16)
    shift = 0.2 * jax.random.normal(k[2], (b, 1, c), jnp.bfloat16)

    pq = fused_rms_mod_quant(x, cvec, shift, eps=eps, interpret=True)
    assert pq.shape == x.shape and pq.dtype == x.dtype
    assert pq.q.shape == (b * n, c) and pq.q.dtype == jnp.int8
    assert pq.s.shape == (b * n, 1) and pq.s.dtype == jnp.float32

    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, axis=-1, keepdims=True) + eps
    ) * cvec.astype(jnp.float32) + shift.astype(jnp.float32)
    s_ref = jnp.maximum(
        jnp.max(jnp.abs(y), -1, keepdims=True), 1e-30
    ) / 127.0
    q_ref = jnp.clip(jnp.round(y / s_ref), -127, 127).astype(jnp.int32)

    np.testing.assert_allclose(
        np.asarray(pq.s), np.asarray(s_ref.reshape(b * n, 1)), rtol=1e-6
    )
    diff = np.abs(
        np.asarray(pq.q, dtype=np.int32).reshape(b, n, c) - np.asarray(q_ref)
    )
    assert diff.max() <= 1, diff.max()
    # the zero input row quantizes to the (finite) shift vector
    assert bool(jnp.all(jnp.isfinite(pq.s)))

    # no-shift (single_scale adaptive norm) variant
    pq2 = fused_rms_mod_quant(x, cvec, None, eps=eps, interpret=True)
    y2 = y - shift.astype(jnp.float32)
    deq = (
        np.asarray(pq2.q, np.float32).reshape(b, n, c)
        * np.asarray(pq2.s).reshape(b, n, 1)
    )
    lvl = np.asarray(pq2.s).reshape(b, n, 1)
    assert np.all(np.abs(deq - np.asarray(y2)) <= 0.51 * lvl + 1e-7)


@pytest.mark.parametrize("act", ["geglu", "gelu", "gelu-approximate"])
def test_fused_act_quant_matches_reference(act):
    """Fused FF activation + row-quant
    (ops/int8_matmul.py:fused_act_quant) == jax.nn.gelu reference for all
    three activation_fn variants."""
    from avatar_tpu.ops.int8_matmul import fused_act_quant

    b, n, c2 = 1, 200, 512
    f = c2 // 2 if act == "geglu" else c2
    h = jax.random.normal(jax.random.PRNGKey(3), (b, n, c2), jnp.bfloat16)
    pq = fused_act_quant(h, act, interpret=True)
    assert pq.q.shape == (b * n, f) and pq.shape == (b, n, f)

    hf = h.astype(jnp.float32)
    if act == "geglu":
        y = hf[..., :f] * jax.nn.gelu(hf[..., f:], approximate=False)
    else:
        y = jax.nn.gelu(hf, approximate=act == "gelu-approximate")
    s_ref = jnp.maximum(
        jnp.max(jnp.abs(y), -1, keepdims=True), 1e-30
    ) / 127.0
    np.testing.assert_allclose(
        np.asarray(pq.s), np.asarray(s_ref.reshape(b * n, 1)),
        rtol=2e-5,
    )
    deq = (
        np.asarray(pq.q, np.float32).reshape(b, n, f)
        * np.asarray(pq.s).reshape(b, n, 1)
    )
    lvl = np.asarray(s_ref)
    assert np.all(np.abs(deq - np.asarray(y)) <= 0.6 * lvl + 1e-6)


def test_fused_quant_block_path_matches_unfused(monkeypatch):
    """The long-sequence fused norm+quant wiring in the quantized DiT block
    (models/dit.py:_block_apply with fused_rms_mod_quant/fused_geglu_quant
    producers) stays within quant noise of the unfused W8A8 path.  CPU run
    with tpu_backend patched true -> all Pallas kernels in interpret mode."""
    import avatar_tpu.ops.attention as attention_mod
    from avatar_tpu.models.dit import DiTConfig, dit_apply, init_dit
    from avatar_tpu.ops.rope import get_latent_coords
    from avatar_tpu.utils.quantize import quantize_dit_params

    cfg = DiTConfig(num_attention_heads=2, attention_head_dim=16,
                    in_channels=8, out_channels=8, num_layers=2,
                    cross_attention_dim=32, caption_channels=24)
    params = init_dit(jax.random.PRNGKey(0), cfg)
    qparams = quantize_dit_params(params, mode="w8a8")

    n_tok = 2048  # >= the long-sequence routing threshold
    tokens = jax.random.normal(jax.random.PRNGKey(1), (1, n_tok, 8)) * 0.3
    grid = get_latent_coords(8, 16, 16, 1)
    assert grid.shape[-1] == n_tok
    text = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 24))
    t = jnp.asarray([0.5])

    out_plain = dit_apply(qparams, cfg, tokens, grid, t, text,
                          jnp.ones((1, 4)), attention_impl="xla")
    monkeypatch.setattr(attention_mod, "tpu_backend", lambda: True)
    out_fused = dit_apply(qparams, cfg, tokens, grid, t, text,
                          jnp.ones((1, 4)), attention_impl="xla")
    rel = float(jnp.abs(out_fused - out_plain).mean()
                / (jnp.abs(out_plain).mean() + 1e-9))
    assert rel < 0.03, rel


class TestDenseBiasFlash:
    """Dense additive-bias flash kernel (VERDICT r2 item 9): the general
    [B, 1|H, Lq, Lk] bias the reference's mask preparation can produce
    (attention.py:825-932) no longer falls back to XLA."""

    def _qkv(self, rng, b=2, h=2, lq=256, lk=192, d=32):
        q = jnp.asarray(rng.standard_normal((b, h, lq, d)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((b, h, lk, d)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((b, h, lk, d)).astype(np.float32))
        return q, k, v

    @pytest.mark.parametrize("per_head", [False, True])
    def test_matches_xla(self, rng, per_head):
        q, k, v = self._qkv(rng)
        shape = (2, 2 if per_head else 1, 256, 192)
        bias = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        out = flash_attention(q, k, v, bias=bias, block_q=128, block_kv=128)
        ref = xla_attention(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_neg_inf_bias_matches_keep_mask(self, rng):
        """-1e30-style masking biases behave exactly like keep masks,
        including fully-masked rows (zero output, no NaN)."""
        q, k, v = self._qkv(rng)
        keep = (rng.random((2, 192)) > 0.4).astype(np.float32)
        keep_r = keep.copy()
        keep_r[1, :] = 0.0  # batch 1: every key masked
        bias = jnp.asarray(
            np.where(keep_r[:, None, None, :] > 0.5, 0.0, -1e30)
            * np.ones((2, 1, 256, 1), np.float32)
        )
        out = flash_attention(q, k, v, bias=bias, block_q=128, block_kv=128)
        out_m = flash_attention(q, k, v, kv_mask=jnp.asarray(keep_r),
                                block_q=128, block_kv=128)
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_m),
                                   atol=3e-5)
        np.testing.assert_allclose(np.asarray(out)[1], 0.0, atol=1e-6)

    def test_non_multiple_lengths(self, rng):
        q, k, v = self._qkv(rng, lq=250, lk=130)
        bias = jnp.asarray(rng.standard_normal((2, 1, 250, 130)).astype(np.float32))
        out = flash_attention(q, k, v, bias=bias, block_q=128, block_kv=128)
        ref = xla_attention(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    @pytest.mark.parametrize("per_head,lq,lk", [
        (True, 128, 128),
        (False, 128, 128),   # shared bias: db accumulates over heads
        (False, 250, 130),   # ragged: padded cols/rows must not leak into db
    ])
    def test_grads_match_xla(self, rng, per_head, lq, lk):
        """Pallas dense-bias backward (dq/dkv/db kernels with bias
        regeneration, VERDICT r3 item 9 — was an XLA recompute) == XLA vjp,
        including the shared-across-heads db accumulation."""
        q, k, v = self._qkv(rng, b=2, h=2, lq=lq, lk=lk)
        shape = (2, 2 if per_head else 1, lq, lk)
        bias = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

        def loss(fn):
            def inner(q_, k_, v_, b_):
                return jnp.sum(fn(q_, k_, v_, b_) ** 2)
            return inner

        g_f = jax.grad(
            loss(lambda q_, k_, v_, b_: flash_attention(
                q_, k_, v_, bias=b_, block_q=128, block_kv=128)),
            argnums=(0, 1, 2, 3),
        )(q, k, v, bias)
        g_x = jax.grad(
            loss(lambda q_, k_, v_, b_: xla_attention(q_, k_, v_, b_)),
            argnums=(0, 1, 2, 3),
        )(q, k, v, bias)
        for a, b in zip(g_f, g_x):
            assert a.shape == b.shape
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)

    def test_via_scaled_dot_product(self, rng):
        """The dispatch layer routes 4-D masks through the kernel now
        (no silent XLA fallback) — verified by value parity under
        impl='flash'."""
        from avatar_tpu.ops.attention import scaled_dot_product_attention

        q, k, v = self._qkv(rng)
        bias = jnp.asarray(rng.standard_normal((2, 1, 256, 192)).astype(np.float32))
        out = scaled_dot_product_attention(q, k, v, mask=bias, impl="flash")
        ref = scaled_dot_product_attention(q, k, v, mask=bias, impl="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
