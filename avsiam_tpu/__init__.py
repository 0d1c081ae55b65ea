"""AVSiam-TPU: a TPU-native audio-visual siamese ViT framework.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of GenjiB/AVSiam
("Siamese Vision Transformers are Scalable Audio-visual Learners",
arXiv:2403.19638): shared ViT audio+video encoding, contrastive + MAE
pretraining, audio-visual classification finetuning, and retrieval —
designed for SPMD execution over TPU device meshes.
"""

__version__ = "0.1.0"

from avsiam_tpu import configs  # noqa: F401
