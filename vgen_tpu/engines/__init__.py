from . import infer_t2v
