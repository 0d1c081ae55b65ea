from avsiam_tpu.utils import checkpoint, torch_import
