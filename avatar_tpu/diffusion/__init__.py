from avatar_tpu.diffusion.rf import (
    RectifiedFlowSchedule,
    add_noise,
    velocity_target,
    make_sigmas,
    linear_quadratic_schedule,
    time_shift,
    sd3_resolution_dependent_timestep_shift,
    simple_diffusion_resolution_dependent_timestep_shift,
    shift_timesteps,
    rf_step,
)

__all__ = [
    "RectifiedFlowSchedule",
    "add_noise",
    "velocity_target",
    "make_sigmas",
    "linear_quadratic_schedule",
    "time_shift",
    "sd3_resolution_dependent_timestep_shift",
    "simple_diffusion_resolution_dependent_timestep_shift",
    "shift_timesteps",
    "rf_step",
]
