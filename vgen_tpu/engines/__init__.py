from . import hooks, infer_i2vgen, infer_sr600, infer_t2v, pretrain, train_t2v
