from . import ckpt, optim
