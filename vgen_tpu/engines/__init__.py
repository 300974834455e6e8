from . import (hooks, infer_dreamvideo, infer_higen, infer_i2vgen,
               infer_sr600, infer_t2v, infer_tft2v, infer_videolcm,
               pretrain, train_dreamvideo, train_instructvideo, train_t2v,
               train_videolcm)
