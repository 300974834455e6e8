from . import ckpt, misc, optim, profiling
from .misc import find_free_port, to_device
from .profiling import StepTimer, device_memory_stats, log_compile_time, trace
