from . import blocks
from .unet_t2v import UNetSD_T2VBase, build_unet_t2v, filter_construct
