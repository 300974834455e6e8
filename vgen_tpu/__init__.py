"""vgen_tpu — a TPU-native video diffusion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ali-vilab/VGen:
registry-driven multi-method video diffusion (ModelScope-T2V, I2VGen-XL,
TF-T2V/VideoComposer, HiGen, InstructVideo, DreamVideo, VideoLCM, SR600)
designed for TPU hardware: NHWC layouts, Pallas attention kernels, lax.scan
denoising loops, pjit/shard_map mesh parallelism, Orbax checkpoints.
"""

__version__ = "0.1.0"

from . import core  # registries + config are always safe to import
from . import diffusion  # import side-effect: registers DIFFUSION classes
from . import models  # import side-effect: registers MODEL entries
