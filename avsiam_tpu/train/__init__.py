from avsiam_tpu.train import finetune, optim, param_groups, pretrain
