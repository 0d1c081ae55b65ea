from avsiam_tpu.models.cavmae import CAVMAEPretrain, MAEDecoder
from avsiam_tpu.models.cavmae_ft import CAVMAEFinetune, MlpHead
from avsiam_tpu.models.layers import (Attention, LayerNormFP32, Mlp,
                                      ModalityBlock, PatchEmbed, SiameseViT)
