from avsiam_tpu.eval.metrics import (AverageMeter, calculate_stats, d_prime,
                                     mean_ap, mean_auc)
from avsiam_tpu.eval.retrieval import (compute_metrics, retrieval_metrics,
                                       similarity_matrix)
