from . import blocks, blocks_legacy
from .autoencoder import (AutoencoderKL, AutoencoderVideo,
                          DiagonalGaussianDistribution, IdentityFirstStage)
from .adapters import (Adapter, BasicTransformerBlockWithAdapter,
                       SpatialTransformerWithAdapter,
                       TemporalTransformerWithAdapter)
from .clip import (CLIPModule, FrozenOpenCLIPCustomEmbedder,
                   FrozenOpenCLIPEmbedder,
                   FrozenOpenCLIPEmbedderZero, FrozenOpenCLIPTextVisualEmbedder,
                   FrozenOpenCLIPVisualEmbedder, SimpleTokenizer,
                   clip_preprocess)
from .embedding_manager import EmbeddingManager
from .reward import (DDPORewardModel, DiffRewardModel, PerPromptStatTracker,
                     RWRRewardModel)
from .unet_dreamvideo import UNetSD_DreamVideo, build_unet_dreamvideo
from .unet_higen import TextContextCrossTransformer, UNetSD_HiGen, build_unet_higen
from .unet_i2vgen import UNetSD_I2VGen, adaptive_avg_pool2d, build_unet_i2vgen
from .unet_sr600 import UNetSD_SR600, build_unet_sr600, fourier_filter
from .unet_tft2v import (ConditionStem, UNetSD_TFT2V, UNetSD_VideoLCM,
                         build_unet_tft2v, build_unet_videolcm)
from .unet_t2v import UNetSD_T2VBase, build_unet_t2v, filter_construct
