from .attention import attention, flash_attention_tpu
from .groupnorm import group_norm
from .sp_attention import allgather_attention, ring_attention, sp_attention
