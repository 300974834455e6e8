from .attention import attention, flash_attention_tpu
