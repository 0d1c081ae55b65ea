"""Generate parity golden fixtures — run on a machine WITH network/extras.

Two blocked parity checks (PARITY.md "Residual parity risks") need artifacts
this zero-egress build host cannot produce:

1. **torchaudio fbank golden vectors** — the reference's DSP is
   ``torchaudio.compliance.kaldi.fbank(htk_compat=True, sample_frequency=sr,
   use_energy=False, window_type='hanning', num_mel_bins=128, dither=0.0,
   frame_shift=10)`` (src/dataloader.py:328). On a machine with torchaudio:

       python scripts/gen_goldens.py fbank

   writes ``tests/fixtures/fbank_torchaudio.npz``;
   ``tests/test_fbank.py::test_fbank_matches_torchaudio_golden`` then stops
   skipping and compares our JAX/NumPy/native implementations against it.

2. **reference-checkpoint activations** — on a machine with timm + torch +
   a clone of GenjiB/AVSiam + a checkpoint from its README table:

       python scripts/gen_goldens.py activations \
           --reference-src /path/to/AVSiam/src --ckpt /path/to/as2m.pth

   instantiates the reference's own ``CAVMAEFT_BASE``, loads the checkpoint
   through its DataParallel shim (run_cavmae_ft_base.py:243-258), runs the
   committed seeded inputs through every eval mode, and writes
   ``tests/fixtures/ref_activations.npz`` (inputs + logits + ckpt path).
   ``tests/test_torch_parity.py::test_reference_checkpoint_activations``
   then loads the same .pth through our importer and compares.

Both fixture files are consumed automatically when present — commit them (or
drop them into tests/fixtures/) and re-run the suite.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures")
SR = 16000


def golden_waveforms() -> dict:
    """Deterministic waveform set shared by the generator and the tests.

    Covers: broadband noise (dense mel excitation), a pure tone (peak-bin
    placement), a chirp (sweeps every mel edge), an impulse in silence (log
    floor + window snipping), and a longer noise clip (frame-count math).
    """
    rs = np.random.RandomState(0)
    t1 = np.arange(SR) / SR
    return {
        "noise_1s": (rs.randn(SR) * 0.1).astype(np.float32),
        "tone_440": (0.5 * np.sin(2 * np.pi * 440.0
                                  * np.arange(SR // 2) / SR)
                     ).astype(np.float32),
        "chirp": (0.3 * np.sin(2 * np.pi * (100.0 + (7900.0 - 100.0)
                                            * t1 / 2.0) * t1)
                  ).astype(np.float32),
        "impulse": np.concatenate(
            [np.zeros(1000, np.float32), np.asarray([0.9], np.float32),
             np.zeros(SR * 3 // 10 - 1001, np.float32)]),
        "noise_2s": (rs.randn(2 * SR) * 0.05).astype(np.float32),
    }


def gen_fbank_torchaudio() -> str:
    import torch
    import torchaudio

    out = {}
    for name, wav in golden_waveforms().items():
        fb = torchaudio.compliance.kaldi.fbank(
            torch.from_numpy(wav)[None], htk_compat=True,
            sample_frequency=SR, use_energy=False, window_type="hanning",
            num_mel_bins=128, dither=0.0, frame_shift=10)
        out[name] = fb.numpy().astype(np.float32)
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    path = os.path.join(FIXTURE_DIR, "fbank_torchaudio.npz")
    np.savez_compressed(path, **out,
                        meta_torchaudio=np.bytes_(torchaudio.__version__))
    print(f"wrote {path}: " + ", ".join(
        f"{k} {v.shape}" for k, v in out.items()))
    return path


def gen_native_oracle() -> str:
    """Regenerate the COMMITTED in-repo golden (tests/fixtures/
    fbank_golden.npz) from our native C++ DSP oracle — run on the build
    host itself; regression-locks fbank numerics without torchaudio."""
    from avsiam_tpu.data import native_dsp

    if not native_dsp.available() and not native_dsp.build():
        raise SystemExit("native DSP unavailable (make -C native failed?)")
    out = {name: native_dsp.fbank(wav).astype(np.float32)
           for name, wav in golden_waveforms().items()}
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    path = os.path.join(FIXTURE_DIR, "fbank_golden.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: " + ", ".join(
        f"{k} {v.shape}" for k, v in out.items()))
    return path


def activation_inputs() -> dict:
    """Seeded full-geometry inputs for the checkpoint-activation fixture."""
    rs = np.random.RandomState(87)
    return {
        # post-normalization fbank statistics (mean -5.081 / std 4.4849
        # already applied by the dataset) — draw at that scale
        "audio": (rs.randn(2, 1024, 128) * 1.0).astype(np.float32),
        "video": (rs.randn(2, 3, 224, 224) * 0.5).astype(np.float32),
    }


def gen_activations(reference_src: str, ckpt: str, label_dim: int) -> str:
    import sys

    import torch

    sys.path.insert(0, reference_src)
    import models  # the reference package (src/models/__init__.py)

    model = models.CAVMAEFT_BASE(label_dim=label_dim)
    sd = torch.load(ckpt, map_location="cpu")
    # run_cavmae_ft_base.py:243-258: non-strict load through a DataParallel
    # wrapper to eat the 'module.' prefix
    wrapped = torch.nn.DataParallel(model)
    miss, unexp = wrapped.load_state_dict(sd, strict=False)
    model = wrapped.module.eval()
    ins = activation_inputs()
    a = torch.from_numpy(ins["audio"])
    v = torch.from_numpy(ins["video"])
    out = dict(ins)
    with torch.no_grad():
        for mode in ("audioonly", "videoonly", "mm_grad"):
            r = model(a, v, mode, is_eval=True)
            logits = r[0] if isinstance(r, (tuple, list)) else r
            out[f"logits_{mode}"] = logits.float().numpy()
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    path = os.path.join(FIXTURE_DIR, "ref_activations.npz")
    np.savez_compressed(
        path, **out, meta_ckpt=np.bytes_(os.path.abspath(ckpt)),
        meta_label_dim=np.int64(label_dim),
        meta_missing=np.int64(len(miss)), meta_unexpected=np.int64(len(unexp)))
    print(f"wrote {path} (ckpt={ckpt}, missing={len(miss)}, "
          f"unexpected={len(unexp)})")
    return path


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("fbank", help="torchaudio fbank goldens (needs torchaudio)")
    sub.add_parser("native", help="regenerate the committed native-oracle "
                                  "golden (runs on the build host)")
    pa = sub.add_parser("activations",
                        help="reference-checkpoint activations "
                             "(needs torch+timm+AVSiam clone)")
    pa.add_argument("--reference-src", required=True,
                    help="path to the AVSiam clone's src/ directory")
    pa.add_argument("--ckpt", required=True, help="reference .pth checkpoint")
    pa.add_argument("--label_dim", type=int, default=527)
    args = p.parse_args(argv)
    if args.cmd == "fbank":
        gen_fbank_torchaudio()
    elif args.cmd == "native":
        gen_native_oracle()
    else:
        gen_activations(args.reference_src, args.ckpt, args.label_dim)


if __name__ == "__main__":
    main()
