from . import hooks, infer_i2vgen, infer_t2v, pretrain, train_t2v
