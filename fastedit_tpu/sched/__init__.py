from fastedit_tpu.sched.lcm import (  # noqa: F401
    LCMSchedulerConfig,
    LCMSchedule,
    alphas_cumprod,
    lcm_timesteps,
    truncate_timesteps_for_img2img,
    make_schedule,
    add_noise,
    lcm_step,
)
