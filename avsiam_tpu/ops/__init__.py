from avsiam_tpu.ops.attention import attention, pallas_attention, xla_attention
from avsiam_tpu.ops.contrastive import info_nce, info_nce_gathered, l2_normalize
from avsiam_tpu.ops.masking import (keep_mask_structured, keep_mask_unstructured,
                                    len_keep_for, masked_mean, random_masking,
                                    random_masking_structured)
from avsiam_tpu.ops.patchify import audio_to_image, patchify, unpatchify
