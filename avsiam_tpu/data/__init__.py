from avsiam_tpu.data.dataset import (AVDataset, make_eval_transform,
                                     make_train_transform)
from avsiam_tpu.data.indices import (JsonIndex, NpyIndex, Record, SampleIndex,
                                     SqliteIndex, make_index_dict,
                                     multihot_labels, open_index)
from avsiam_tpu.data.pipeline import Prefetcher, device_loader, host_batches
from avsiam_tpu.data.samplers import (batched, eval_shard_indices,
                                      shuffled_epoch_indices, weighted_indices)
