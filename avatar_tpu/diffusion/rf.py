"""Rectified-flow scheduler, TPU-native.

Pure-function re-design of the reference ``RectifiedFlowScheduler``
(`/root/reference/ltx_video/schedulers/rf.py:176-426`): the forward process is
x_t = (1 - t) * x0 + t * eps and the model predicts the velocity
v = dx_t/dt = -x0 + eps.  Sampling is an explicit Euler walk down a sigma
schedule.

Differences from the reference (deliberate, TPU-first):
- Schedule construction and resolution-dependent shifting are *host-side*
  numpy: they depend only on static shapes and step counts, so they are
  computed once and passed into jit as constants.
- The per-token "find next lower timestep" search (`rf.py:342-361`) is a
  vectorized masked-max instead of a boolean-index loop, so it traces under
  ``jax.jit`` with static shapes.
- No mutable scheduler object: the schedule is an immutable pytree
  (:class:`RectifiedFlowSchedule`) threaded through the sampling loop.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

T_EPS = 1e-6  # matches reference rf.py:342


# ---------------------------------------------------------------------------
# Schedule construction (host-side, static)
# ---------------------------------------------------------------------------


def linear_quadratic_schedule(
    num_steps: int,
    threshold_noise: float = 0.025,
    linear_steps: Optional[int] = None,
) -> np.ndarray:
    """Linear-then-quadratic sigma schedule (reference rf.py:25-46)."""
    if num_steps == 1:
        return np.asarray([1.0], dtype=np.float64)
    if linear_steps is None:
        linear_steps = num_steps // 2
    linear = [i * threshold_noise / linear_steps for i in range(linear_steps)]
    threshold_noise_step_diff = linear_steps - threshold_noise * num_steps
    quadratic_steps = num_steps - linear_steps
    quadratic_coef = threshold_noise_step_diff / (linear_steps * quadratic_steps**2)
    linear_coef = threshold_noise / linear_steps - 2 * threshold_noise_step_diff / (
        quadratic_steps**2
    )
    const = quadratic_coef * (linear_steps**2)
    quadratic = [
        quadratic_coef * (i**2) + linear_coef * i + const
        for i in range(linear_steps, num_steps)
    ]
    sigma = linear + quadratic + [1.0]
    sigma = [1.0 - x for x in sigma]
    return np.asarray(sigma[:-1], dtype=np.float64)


def time_shift(
    mu: float, sigma: float, t: Union[np.ndarray, float]
) -> np.ndarray:
    """Constant time shift t' = e^mu / (e^mu + (1/t - 1)^sigma) (rf.py:69-70)."""
    t = np.asarray(t, dtype=np.float64)
    return math.exp(mu) / (math.exp(mu) + (1.0 / t - 1.0) ** sigma)


def get_normal_shift(
    n_tokens: int,
    min_tokens: int = 1024,
    max_tokens: int = 4096,
    min_shift: float = 0.95,
    max_shift: float = 2.05,
) -> float:
    """Token-count-linear mu for the SD3 shift (rf.py:73-82)."""
    m = (max_shift - min_shift) / (max_tokens - min_tokens)
    b = min_shift - m * min_tokens
    return m * n_tokens + b


def strech_shifts_to_terminal(shifts: np.ndarray, terminal: float = 0.1) -> np.ndarray:
    """Rescale shifted timesteps so the final value equals ``terminal``
    (rf.py:85-109; name kept, typo and all, for greppability)."""
    if shifts.size == 0:
        raise ValueError("The 'shifts' array must not be empty.")
    if terminal <= 0 or terminal >= 1:
        raise ValueError("The terminal value must be in (0, 1).")
    one_minus_z = 1.0 - shifts
    scale_factor = one_minus_z[-1] / (1.0 - terminal)
    if scale_factor == 0.0:
        # degenerate single-step schedule ending at t=1: the stretch is
        # ill-defined (the reference divides by zero here, rf.py:105-108);
        # leave the shifts untouched instead of producing NaNs
        return shifts
    return 1.0 - (one_minus_z / scale_factor)


def _token_count_from_shape(samples_shape: Sequence[int]) -> int:
    if len(samples_shape) == 3:
        return int(samples_shape[1])
    if len(samples_shape) in (4, 5):
        return int(np.prod(samples_shape[2:]))
    raise ValueError(
        "Samples must have shape (b, t, c), (b, c, h, w) or (b, c, f, h, w)"
    )


def sd3_resolution_dependent_timestep_shift(
    samples_shape: Sequence[int],
    timesteps: np.ndarray,
    target_shift_terminal: Optional[float] = None,
) -> np.ndarray:
    """SD3/Flux-style resolution-dependent shift (rf.py:112-149)."""
    m = _token_count_from_shape(samples_shape)
    shift = get_normal_shift(m)
    shifted = time_shift(shift, 1.0, timesteps)
    if target_shift_terminal is not None:
        shifted = strech_shifts_to_terminal(shifted, target_shift_terminal)
    return shifted


def simple_diffusion_resolution_dependent_timestep_shift(
    samples_shape: Sequence[int],
    timesteps: np.ndarray,
    n: int = 32 * 32,
) -> np.ndarray:
    """SimpleDiffusion SNR-based shift (rf.py:49-66)."""
    m = _token_count_from_shape(samples_shape)
    t = np.asarray(timesteps, dtype=np.float64)
    snr = (t / (1.0 - t)) ** 2
    shift_snr = np.log(snr) + 2.0 * math.log(m / n)
    return 1.0 / (1.0 + np.exp(-0.5 * shift_snr))  # sigmoid


def make_sigmas(
    num_steps: int,
    sampler: str = "Uniform",
    shift: Optional[float] = None,
) -> np.ndarray:
    """Initial (unshifted) sigma schedule (rf.py:201-214)."""
    if sampler == "Uniform":
        return np.linspace(1.0, 1.0 / num_steps, num_steps, dtype=np.float64)
    if sampler == "LinearQuadratic":
        return linear_quadratic_schedule(num_steps)
    if sampler == "Constant":
        assert shift is not None, "Shift must be provided for Constant sampler."
        return time_shift(
            shift, 1.0, np.linspace(1.0, 1.0 / num_steps, num_steps, dtype=np.float64)
        )
    raise ValueError(f"Unknown sampler: {sampler}")


def shift_timesteps(
    timesteps: np.ndarray,
    samples_shape: Optional[Sequence[int]] = None,
    shifting: Optional[str] = None,
    target_shift_terminal: Optional[float] = None,
    base_resolution: int = 32 * 32,
) -> np.ndarray:
    """Resolution-dependent timestep shift dispatch (rf.py:216-225)."""
    if shifting == "SD3":
        return sd3_resolution_dependent_timestep_shift(
            samples_shape, timesteps, target_shift_terminal
        )
    if shifting == "SimpleDiffusion":
        return simple_diffusion_resolution_dependent_timestep_shift(
            samples_shape, timesteps, base_resolution
        )
    return timesteps


@dataclass(frozen=True)
class RectifiedFlowSchedule:
    """Immutable rectified-flow schedule.

    Attributes:
      sigmas: descending noise levels in (0, 1], shape [num_steps].
      num_train_timesteps / shifting / target_shift_terminal / sampler / shift:
        construction metadata mirroring the reference config
        (`configs/ltxv-2b-0.9.6-dev.yaml` scheduler block and
        ``OURS_SCHEDULER_CONFIG`` in diffusers_config_mapping.py:65-72).
    """

    sigmas: np.ndarray
    num_train_timesteps: int = 1000
    shifting: Optional[str] = None
    target_shift_terminal: Optional[float] = None
    base_resolution: int = 32 * 32
    sampler: str = "Uniform"
    shift: Optional[float] = None

    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 1000,
        sampler: str = "Uniform",
        shifting: Optional[str] = None,
        target_shift_terminal: Optional[float] = None,
        base_resolution: int = 32 * 32,
        shift: Optional[float] = None,
    ) -> "RectifiedFlowSchedule":
        sigmas = make_sigmas(num_train_timesteps, sampler, shift)
        return cls(
            sigmas=sigmas,
            num_train_timesteps=num_train_timesteps,
            shifting=shifting,
            target_shift_terminal=target_shift_terminal,
            base_resolution=base_resolution,
            sampler=sampler,
            shift=shift,
        )

    @classmethod
    def from_config(cls, config: dict) -> "RectifiedFlowSchedule":
        """Build from a reference-format scheduler config dict
        (rf.py:263-286 / OURS_SCHEDULER_CONFIG)."""
        return cls.create(
            num_train_timesteps=config.get("num_train_timesteps", 1000),
            sampler=config.get("sampler", "Uniform") or "Uniform",
            shifting=config.get("shifting"),
            target_shift_terminal=config.get("target_shift_terminal"),
            base_resolution=config.get("base_resolution") or 32 * 32,
            shift=config.get("shift"),
        )

    def set_timesteps(
        self,
        num_inference_steps: Optional[int] = None,
        samples_shape: Optional[Sequence[int]] = None,
        timesteps: Optional[np.ndarray] = None,
    ) -> "RectifiedFlowSchedule":
        """Return a new schedule restricted to inference steps (rf.py:227-261)."""
        if timesteps is not None and num_inference_steps is not None:
            raise ValueError("Provide either `timesteps` or `num_inference_steps`.")
        if timesteps is None:
            num_inference_steps = min(self.num_train_timesteps, num_inference_steps)
            t = make_sigmas(num_inference_steps, self.sampler, self.shift)
            t = shift_timesteps(
                t,
                samples_shape=samples_shape,
                shifting=self.shifting,
                target_shift_terminal=self.target_shift_terminal,
                base_resolution=self.base_resolution,
            )
        else:
            t = np.asarray(timesteps, dtype=np.float64)
        return RectifiedFlowSchedule(
            sigmas=t,
            num_train_timesteps=self.num_train_timesteps,
            shifting=self.shifting,
            target_shift_terminal=self.target_shift_terminal,
            base_resolution=self.base_resolution,
            sampler=self.sampler,
            shift=self.shift,
        )

    def to_config(self) -> dict:
        return {
            "_class_name": "RectifiedFlowScheduler",
            "num_train_timesteps": self.num_train_timesteps,
            "shifting": self.shifting,
            "base_resolution": None
            if self.shifting == "SD3"
            else self.base_resolution,
            "target_shift_terminal": self.target_shift_terminal,
            "sampler": self.sampler,
            "shift": self.shift,
        }


# ---------------------------------------------------------------------------
# Device-side pure functions (jit-safe)
# ---------------------------------------------------------------------------


def _append_dims(x: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Right-pad dims (reference utils/torch_utils.py:16-25)."""
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


def add_noise(
    original_samples: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps: jnp.ndarray,
) -> jnp.ndarray:
    """x_t = (1 - t) * x0 + t * eps (rf.py:376-386)."""
    sigmas = _append_dims(jnp.asarray(timesteps), original_samples.ndim)
    return (1.0 - sigmas) * original_samples + sigmas * noise


def velocity_target(
    tokens: jnp.ndarray,
    noise: jnp.ndarray,
    t: jnp.ndarray,  # noqa: ARG001 - kept for signature parity; RF velocity is t-free
) -> jnp.ndarray:
    """v = alpha'(t) x0 + sigma'(t) eps = -x0 + eps (rf.py:388-426)."""
    return -tokens + noise


def rf_step(
    sigmas: jnp.ndarray,
    model_output: jnp.ndarray,
    timestep: jnp.ndarray,
    sample: jnp.ndarray,
    stochastic_sampling: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """One Euler step z_{t-1} = z_t - dt * v (rf.py:305-374).

    Args:
      sigmas: the full inference schedule, shape [S], descending.
      model_output: predicted velocity, same shape as ``sample``.
      timestep: scalar () or per-token [B, N] current noise level(s); not
        required to be a member of ``sigmas``.
      sample: current latents; [B, N, C] in the per-token case.
      stochastic_sampling: re-noise x0 to the next level instead of the
        deterministic Euler step (rf.py:364-367).
    """
    sigmas = jnp.asarray(sigmas, dtype=sample.dtype)
    timestep = jnp.asarray(timestep, dtype=sample.dtype)
    timesteps_padded = jnp.concatenate([sigmas, jnp.zeros((1,), sigmas.dtype)])

    if timestep.ndim == 0:
        # Global timestep: the largest schedule value strictly below t.
        lower_mask = timesteps_padded < (timestep - T_EPS)
        lower_timestep = jnp.max(jnp.where(lower_mask, timesteps_padded, 0.0))
        dt = timestep - lower_timestep
        t_full = timestep
    else:
        assert timestep.ndim == 2, "per-token timestep must be [B, N]"
        lower_mask = timesteps_padded[:, None, None] < (timestep[None] - T_EPS)
        lower_timestep = jnp.max(
            lower_mask * timesteps_padded[:, None, None], axis=0
        )
        dt = (timestep - lower_timestep)[..., None]
        t_full = timestep[..., None]

    if stochastic_sampling:
        assert key is not None, "stochastic sampling requires a PRNG key"
        x0 = sample - t_full * model_output
        next_timestep = t_full - dt
        noise = jax.random.normal(key, sample.shape, dtype=sample.dtype)
        return add_noise(x0, noise, next_timestep)
    return sample - dt * model_output
