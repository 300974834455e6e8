from . import schedules
from .ddim import DiffusionDDIM, DiffusionDDIMSR
from .reward_ddim import DiffusionDDIMReward, GaussianDiffusionReward
from .gauss import GaussianDiffusion, guided_out, sample_dpmpp_2m_sde
from .lcm import (DDIMSolver, LCMScheduler, guidance_scale_embedding,
                  predicted_origin, scalings_for_boundary_conditions)
from .losses import discretized_gaussian_log_likelihood, kl_divergence
from .schedules import (beta_schedule, betas_to_sigmas, karras_schedule,
                        rescale_zero_terminal_snr, sigma_schedule)
