"""Subprocess worker for the multi-process data-parallel tests.

NOT a pytest file — launched by tests/test_multiprocess.py as
``python mp_worker.py <out_json> <num_processes> <process_id> <port>
<local_devices> <data_dir> <exp_dir>``.

Each process runs the REAL ``run_pretrain`` loop over a mesh spanning all
global devices: rank-sharded sampling (data/samplers.py), global-array
assembly from process-local shards (data/pipeline._put_batch), replicated
state placement (train/loops._shard_state), host-local slab eval
(loops._eval_params), collective orbax checkpointing, and rank-0-only file
writes. This is the TPU-native equivalent of the reference's torchrun 2x8
deployment (egs/audioset/run_pretrain_base.sh:3-5,75).
"""

import json
import os
import sys


def main():
    (out_path, nproc, pid, port, ndev, data_dir, exp_dir) = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        int(sys.argv[5]), sys.argv[6], sys.argv[7])

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={ndev}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import numpy as np

    from avsiam_tpu.parallel.dist import (barrier, gather_eval_outputs,
                                          initialize_multihost,
                                          setup_rank0_printing)

    info = initialize_multihost(
        coordinator_address=f"127.0.0.1:{port}" if nproc > 1 else None,
        num_processes=nproc, process_id=pid)
    setup_rank0_printing()
    # suppressed on rank > 0 (utils.py:206-218 parity)...
    print(f"RANK0ONLY world={info['process_count']}")
    # ...but forced prints appear on every rank
    print(f"FORCED-rank{pid}", force=True)

    from avsiam_tpu.configs import (AudioConfig, CAVMAEConfig, DecoderConfig,
                                    MeshConfig, OptimizerConfig,
                                    PretrainConfig, ViTConfig)
    from avsiam_tpu.data.dataset import AVDataset
    from avsiam_tpu.parallel.mesh import make_mesh
    from avsiam_tpu.train.loops import run_pretrain

    vit = ViTConfig(dim=32, depth=2, num_heads=2, patch_size=16, img_size=32,
                    audio_length=128, mel_bins=32)
    audio = AudioConfig(target_length=vit.audio_length,
                        num_mel_bins=vit.mel_bins, sample_rate=16000)
    cfg = PretrainConfig(
        model=CAVMAEConfig(vit=vit, decoder=DecoderConfig(dim=16, depth=1,
                                                          num_heads=2)),
        audio=audio, opt=OptimizerConfig(lr=1e-4), batch_size=8, n_epochs=1,
        n_print_steps=1, exp_dir=exp_dir, seed=87)
    ds = AVDataset(os.path.join(data_dir, "idx.json"), audio,
                   label_csv=os.path.join(data_dir, "labels.csv"),
                   mode="train", frame_source="synthetic",
                   im_res=vit.img_size, num_frames=3)
    val = AVDataset(os.path.join(data_dir, "idx.json"), audio,
                    label_csv=os.path.join(data_dir, "labels.csv"),
                    mode="eval", frame_source="synthetic",
                    im_res=vit.img_size, num_frames=3)
    mesh = make_mesh(MeshConfig(data=jax.device_count(), model=1))
    out = run_pretrain(cfg, ds, val_ds=val, mesh=mesh,
                       max_steps_per_epoch=2)
    rows = [{k: float(v) for k, v in r.items()} for r in out["rows"]]

    # dist-helper coverage: ordered slab gather + trim, then a barrier
    local = np.arange(6, dtype=np.float32).reshape(3, 2) + 100 * pid
    gathered = gather_eval_outputs(local, total=3 * nproc - 1)
    barrier("mp-test")

    with open(out_path, "w") as f:
        json.dump({"pid": pid, "process_count": info["process_count"],
                   "global_devices": info["global_devices"],
                   "rows": rows, "gathered": gathered.tolist()}, f)


if __name__ == "__main__":
    main()
