"""Closed-form rectified-flow scheduler tests.

Port of the reference suite `/root/reference/tests/test_scheduler.py` to the
functional JAX scheduler: each Euler step must equal x - dt * v exactly, for
scalar timesteps, per-token timesteps with frozen t=0 tokens, and timesteps
not in the schedule list. atol 1e-6 as in the reference.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from avatar_tpu.diffusion import RectifiedFlowSchedule, rf_step

pytestmark = pytest.mark.smoke


def init_latents_and_schedule(sampler, rng):
    batch_size, n_tokens, n_channels = 2, 4096, 128
    num_steps = 20
    schedule = RectifiedFlowSchedule.create(sampler=sampler)
    latents = rng.standard_normal((batch_size, n_tokens, n_channels)).astype(
        np.float32
    )
    schedule = schedule.set_timesteps(
        num_inference_steps=num_steps, samples_shape=latents.shape
    )
    return schedule, jnp.asarray(latents)


@pytest.mark.parametrize("sampler", ["LinearQuadratic", "Uniform"])
def test_scheduler_default_behavior(sampler, rng):
    """Single scalar timestep from the schedule list."""
    schedule, latents = init_latents_and_schedule(sampler, rng)
    sigmas = jnp.asarray(schedule.sigmas, dtype=jnp.float32)

    for i, t in enumerate(schedule.sigmas):
        noise_pred = jnp.asarray(
            rng.standard_normal(latents.shape).astype(np.float32)
        )
        denoised = rf_step(sigmas, noise_pred, jnp.float32(t), latents)

        next_t = schedule.sigmas[i + 1] if i < len(schedule.sigmas) - 1 else 0.0
        dt = np.float32(t) - np.float32(next_t)
        expected = latents - dt * noise_pred
        np.testing.assert_allclose(denoised, expected, atol=1e-6)


@pytest.mark.parametrize("sampler", ["LinearQuadratic", "Uniform"])
def test_scheduler_per_token(sampler, rng):
    """Per-token timesteps; tokens at t=0 must stay frozen."""
    schedule, latents = init_latents_and_schedule(sampler, rng)
    sigmas = jnp.asarray(schedule.sigmas, dtype=jnp.float32)
    batch_size, n_tokens = latents.shape[:2]

    for i, t in enumerate(schedule.sigmas):
        timesteps = np.full((batch_size, n_tokens), t, dtype=np.float32)
        timesteps[:, 0] = 0.0
        noise_pred = jnp.asarray(
            rng.standard_normal(latents.shape).astype(np.float32)
        )
        denoised = rf_step(sigmas, noise_pred, jnp.asarray(timesteps), latents)

        next_t = schedule.sigmas[i + 1] if i < len(schedule.sigmas) - 1 else 0.0
        dt = timesteps - np.full_like(timesteps, next_t)
        expected = latents - dt[..., None] * noise_pred
        np.testing.assert_allclose(denoised[:, 1:], expected[:, 1:], atol=1e-6)
        np.testing.assert_allclose(denoised[:, 0], latents[:, 0], atol=1e-6)


@pytest.mark.parametrize("sampler", ["LinearQuadratic", "Uniform"])
def test_scheduler_t_not_in_list(sampler, rng):
    """Per-token timesteps strictly between schedule entries."""
    schedule, latents = init_latents_and_schedule(sampler, rng)
    sigmas = jnp.asarray(schedule.sigmas, dtype=jnp.float32)
    batch_size, n_tokens = latents.shape[:2]

    for i in range(len(schedule.sigmas)):
        if i < len(schedule.sigmas) - 1:
            t = (schedule.sigmas[i] + schedule.sigmas[i + 1]) / 2
        else:
            t = schedule.sigmas[i] / 2
        timesteps = np.full((batch_size, n_tokens), t, dtype=np.float32)
        noise_pred = jnp.asarray(
            rng.standard_normal(latents.shape).astype(np.float32)
        )
        denoised = rf_step(sigmas, noise_pred, jnp.asarray(timesteps), latents)

        next_t = schedule.sigmas[i + 1] if i < len(schedule.sigmas) - 1 else 0.0
        dt = timesteps - np.full_like(timesteps, next_t)
        expected = latents - dt[..., None] * noise_pred
        np.testing.assert_allclose(denoised, expected, atol=1e-6)


def test_add_noise_and_velocity_target(rng):
    """x_t = (1-t)x0 + t*eps and v = -x0 + eps (rf.py:376-426)."""
    from avatar_tpu.diffusion import add_noise, velocity_target

    x0 = jnp.asarray(rng.standard_normal((2, 64, 8)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((2, 64, 8)).astype(np.float32))
    t = jnp.asarray([0.3, 0.7], dtype=jnp.float32)
    xt = add_noise(x0, eps, t)
    np.testing.assert_allclose(
        xt[0], 0.7 * x0[0] + 0.3 * eps[0], atol=1e-6
    )
    np.testing.assert_allclose(
        xt[1], 0.3 * x0[1] + 0.7 * eps[1], atol=1e-6
    )
    v = velocity_target(x0, eps, t)
    np.testing.assert_allclose(v, eps - x0, atol=1e-6)


def test_sd3_shift_monotonic():
    """SD3 shift keeps timesteps in (0,1), descending, terminal stretched."""
    schedule = RectifiedFlowSchedule.create(
        sampler="Uniform", shifting="SD3", target_shift_terminal=0.1
    )
    s = schedule.set_timesteps(
        num_inference_steps=40, samples_shape=(1, 2048, 128)
    )
    t = s.sigmas
    assert (t[:-1] > t[1:]).all()
    assert t[0] <= 1.0 and t[-1] > 0.0
    # after strech_shifts_to_terminal the last entry equals the terminal value
    np.testing.assert_allclose(t[-1], 0.1, atol=1e-6)
