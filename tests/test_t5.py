"""T5 encoder golden parity vs the torch transformers implementation
(random tiny config, no downloads)."""

import jax.numpy as jnp
import numpy as np
import pytest

from avatar_tpu.models.t5 import (
    T5Config,
    import_t5_state,
    t5_encode,
)


@pytest.mark.parametrize("ff_proj", ["gated-gelu", "relu"])
def test_t5_matches_torch(ff_proj):
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    hf_cfg = HFT5Config(
        d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4,
        vocab_size=100, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, feed_forward_proj=ff_proj,
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    model = T5EncoderModel(hf_cfg).eval()

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 100, (2, 12))
    mask = np.ones((2, 12), dtype=np.int64)
    mask[1, 8:] = 0

    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()

    cfg = T5Config.from_dict(hf_cfg.to_dict())
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    params = import_t5_state(state, cfg)
    out = t5_encode(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.float32)
    )
    # masked positions may differ (torch computes them; both are ignored
    # downstream via the attention mask) -> compare kept positions only
    np.testing.assert_allclose(
        np.asarray(out)[0], ref[0], atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out)[1, :8], ref[1, :8], atol=2e-4, rtol=1e-3
    )


def test_t5_init_and_shapes():
    import jax

    from avatar_tpu.models.t5 import init_t5_encoder

    cfg = T5Config(
        vocab_size=50, d_model=16, d_kv=4, d_ff=32, num_layers=2, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=20,
    )
    params = init_t5_encoder(jax.random.PRNGKey(0), cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    out = t5_encode(params, cfg, ids, jnp.ones((1, 8)))
    assert out.shape == (1, 8, 16)
    assert np.isfinite(np.asarray(out)).all()
