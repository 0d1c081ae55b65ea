"""Audio-visual dataset: host raw loading + fused on-device batch transforms.

Split of responsibilities (TPU-first, unlike the reference's per-worker CPU
transform pipeline in src/dataloader.py __getitem__):

* HOST (this module's AVDataset): index lookup, WAV read + mean-center +
  length-fit, frame bytes (pre-extracted JPEG / ffmpeg decode / synthetic),
  multi-hot labels. Output: fixed-shape NumPy arrays.
* DEVICE (make_train_transform / make_eval_transform): everything math-heavy,
  fused under one jit — Kaldi fbank, pad-to-1024, SpecAug, dataset
  normalization, noise+roll, in-batch mixup, image [0,1]-scale + bicubic
  resize + ImageNet normalization. This is the reference's dataloader hot
  path (its acknowledged bottleneck, SURVEY.md section 3.1) moved onto the
  chip.

Mixup note: the reference mixes each sample with a uniformly-random OTHER
dataset sample (src/dataloader.py:373-437); the device fast path mixes with a
random in-batch permutation — the standard approximation with the same
marginal distribution over partners when batches are shuffled. Audio mixes
with lam ~ Beta(10,10); images mix with an independent U[0,1) weight; labels
mix with the audio lam (dataloader.py:417-418,429-434).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from avsiam_tpu.configs import AudioConfig
from avsiam_tpu.data import media
from avsiam_tpu.data.indices import (SampleIndex, make_index_dict,
                                     multihot_labels, open_index)
from avsiam_tpu.ops import augment as aug
from avsiam_tpu.ops.fbank import kaldi_fbank, pad_or_crop_frames


def _stable_hash(s: str) -> int:
    """Process-stable string hash (zlib.crc32); Python's built-in hash() is
    salted per interpreter, so synthetic data keyed on it would differ
    between the ranks of a multi-process run."""
    import zlib
    return zlib.crc32(s.encode("utf-8")) % (2 ** 31)


@dataclass
class AVSample:
    waveform: np.ndarray  # [num_samples] float32, mean-centered, zero-padded
    frames: np.ndarray  # uint8 [T, H, W, 3]
    labels: np.ndarray  # [n_class] float32
    wav_len: int = 0  # true sample count before padding


class AVDataset:
    """Host-side dataset over a SampleIndex.

    frame_source: 'frames' (pre-extracted frame_{i}/{id}.jpg layout),
    'video' (ffmpeg decode), 'synthetic' (deterministic independent-noise
    pseudo-data for tests/benches without media files), or
    'synthetic_paired' (audio and frames expose a shared per-clip latent —
    contrastive-learnability probes; see _load_waveform).
    """

    def __init__(self, index_path: str, audio_conf: AudioConfig,
                 label_csv: Optional[str] = None, n_class: int = 527,
                 mode: str = "train", frame_source: str = "synthetic",
                 num_frames: int = 10, im_res: int = 224,
                 label_smooth: float = 0.0, frame_use: int = -1):
        self.index: SampleIndex = open_index(index_path)
        self.audio_conf = audio_conf
        self.index_dict = make_index_dict(label_csv) if label_csv else {}
        self.n_class = len(self.index_dict) or n_class
        self.mode = mode
        self.frame_source = frame_source
        self.num_frames = num_frames
        self.im_res = im_res
        self.label_smooth = label_smooth
        self.frame_use = frame_use
        self.num_samples_audio = int(
            audio_conf.sample_rate *
            (audio_conf.target_length + 2) * audio_conf.frame_shift_ms / 1000.0)
        # target_length frames need (target_length-1)*shift + window samples;
        # 10.26 s covers 1024 frames at 10 ms shift / 25 ms window.

    def __len__(self):
        return len(self.index)

    # ------------------------------------------------------------------
    def _paired_latent(self, rec, d: int = 8) -> np.ndarray:
        """Per-clip latent shared by audio and frames in 'synthetic_paired'
        mode: sigmoid(z) in (0,1)^d, deterministic per path."""
        z = np.random.RandomState(_stable_hash(rec.wav + "z")).randn(d)
        return 1.0 / (1.0 + np.exp(-z))

    def _load_waveform(self, rec):
        if self.frame_source == "synthetic_paired":
            # Tone bank amplitude-modulated by the shared latent: audio and
            # frames expose the SAME d-dim signal, so the contrastive head
            # has learnable, GENERALIZING audio<->visual structure. Plain
            # 'synthetic' clips are independent noise — training on them
            # collapses the contrastive head to the uniform ln(B) solution
            # (the known property scripts/soak.py works around by overfitting
            # from fresh init); this mode exists for end-to-end probes of
            # contrastive learning through the real pipeline.
            amps = self._paired_latent(rec)
            rng = np.random.RandomState(_stable_hash(rec.wav))
            t = np.arange(self.num_samples_audio, dtype=np.float32)
            sr = float(self.audio_conf.sample_rate)
            freqs = np.geomspace(200.0, 4000.0, num=len(amps))
            w = sum(0.03 * a * np.sin(2 * np.pi * f * t / sr)
                    for a, f in zip(amps, freqs))
            w = (w + rng.randn(self.num_samples_audio) * 0.005).astype(
                np.float32)
        elif self.frame_source == "synthetic":
            # stable hash: Python's hash() is salted PER PROCESS, which would
            # give every rank of a multi-process run different synthetic data
            rng = np.random.RandomState(_stable_hash(rec.wav))
            w = rng.randn(self.num_samples_audio).astype(np.float32) * 0.05
        elif media.is_video_container(rec.wav):
            # audio read straight out of the video container (the reference
            # FT loader's path, dataloader_ft.py:272-278)
            w = media.decode_audio(rec.wav, self.audio_conf.sample_rate)
        else:
            x, sr = media.read_wav(rec.wav)
            x = media.to_mono(x)
            if sr != self.audio_conf.sample_rate:
                x = media.resample(x, sr, self.audio_conf.sample_rate)
            w = x.astype(np.float32)
        w = media.mean_center(w)
        wav_len = min(len(w), self.num_samples_audio)
        return media.fit_length(w, self.num_samples_audio), wav_len

    def _load_frames(self, rec, rng: np.random.RandomState) -> np.ndarray:
        T = self.num_frames
        if self.frame_source == "synthetic_paired":
            # Vertical bands whose intensities are the same latent the tone
            # bank modulates (see _load_waveform); mild per-frame noise keeps
            # multi-frame paths (frame aggregation, random frame draw)
            # meaningful without hiding the signal.
            amps = self._paired_latent(rec)
            r = np.random.RandomState(_stable_hash(rec.wav + "v"))
            cols = np.repeat((40 + 170 * amps),
                             -(-self.im_res // len(amps)))[:self.im_res]
            img = np.broadcast_to(cols[None, :, None],
                                  (self.im_res, self.im_res, 3))
            noise = r.randint(-20, 21, (T, self.im_res, self.im_res, 3))
            return np.clip(img[None] + noise, 0, 255).astype(np.uint8)
        if self.frame_source == "synthetic":
            r = np.random.RandomState(_stable_hash(rec.wav + "v"))
            return r.randint(0, 255, (T, self.im_res, self.im_res, 3),
                             dtype=np.uint8)
        if self.frame_source == "video":
            return media.decode_video_frames(
                rec.video_path or rec.wav, num_frames=T,
                start_jitter=rng.randint(0, 6),
                size=(self.im_res, self.im_res))
        # 'frames': pre-extracted JPEG layout
        frames = []
        for t in range(T):
            p = media.select_frame_with_walkdown(rec.video_path, rec.video_id, t)
            img = media.load_image(p)
            if img.shape[:2] != (self.im_res, self.im_res):
                from PIL import Image
                img = np.asarray(Image.fromarray(img).resize(
                    (self.im_res, self.im_res), Image.BICUBIC))
            frames.append(img)
        return np.stack(frames)

    def get(self, i: int, rng: np.random.RandomState) -> AVSample:
        """Load one sample with the reference's data-level fault tolerance:
        decode errors substitute constant tensors instead of failing the run
        (src/dataloader.py:330,385,424,447,475 return 0.01-filled tensors)."""
        rec = self.index[i]
        try:
            wav, wav_len = self._load_waveform(rec)
        except Exception as e:  # noqa: BLE001 — any decode failure
            print(f"there is an error in loading audio {rec.wav}: {e}")
            wav = np.full(self.num_samples_audio, 0.01, dtype=np.float32)
            wav_len = self.num_samples_audio
        try:
            frames = self._load_frames(rec, rng)
        except Exception as e:  # noqa: BLE001
            print(f"there is an error in loading image {rec.video_path}: {e}")
            frames = np.full((self.num_frames, self.im_res, self.im_res, 3),
                             3, dtype=np.uint8)  # ~0.01 after /255
        labels = multihot_labels(rec.labels, self.index_dict, self.n_class,
                                 self.label_smooth)
        return AVSample(wav, frames, labels, wav_len)

    @staticmethod
    def _sample_rng(rng, i: int) -> np.random.RandomState:
        """Per-sample RandomState. When ``rng`` is an int seed, the stream is
        derived from (seed, key) — ORDER-INDEPENDENT, so any rank
        sharding / batch order reassembles bit-identical batches (torch's
        sequential per-worker streams make runs differ across world sizes;
        keyed derivation is the jax.random.fold_in design applied host-side).
        The key is the sample's global epoch POSITION when the caller
        provides one (``batch(..., positions=)``): weighted class-balanced
        sampling draws the same dataset index several times per epoch, and
        position keying gives each occurrence an independent augmentation
        stream (frame pick, decode aug) like torch's sequential stream does
        — index keying would train oversampled clips on one frozen draw.
        A RandomState is passed through unchanged (legacy sequential mode)."""
        if isinstance(rng, (int, np.integer)):
            return np.random.RandomState(
                (int(rng) * 1000003 + int(i) * 97 + 7) % (2 ** 31))
        return rng

    def batch(self, indices, rng, frames_per_sample: int = 1,
              positions=None):
        """Assemble a host batch. frames_per_sample: 1 (random train frame) or
        num_frames (eval). ``rng``: an int seed (per-sample derived streams,
        see _sample_rng) or a RandomState (sequential). ``positions``: the
        samples' global epoch positions — when given, they key the per-sample
        streams instead of the dataset indices (see _sample_rng). Returns
        (wav [B,n], frames u8 [B,T,H,W,3], labels [B,C]).

        Waveforms are zero-padded to a fixed sample count and the true sample
        counts are returned so the device transform can zero fbank rows
        beyond each clip's frame count — matching the reference's 0.0 fbank
        padding (dataloader.py:333-343) instead of log-eps rows from padded
        silence. Returns (wav, frames, labels, wav_len[B] int32)."""
        wavs, frames, labels = [], [], []
        lens = []
        for j, i in enumerate(indices):
            key = int(positions[j]) if positions is not None else int(i)
            srng = self._sample_rng(rng, key)
            s = self.get(int(i), srng)
            lens.append(s.wav_len)
            if frames_per_sample == 1:
                # random frame of 10 in train; middle/frame_use in eval
                # (src/dataloader.py:347-356,468-471). An explicit
                # frame_use >= 0 pins the frame in train mode too (opt-in
                # determinism for probes/debugging; the reference always
                # randomizes -1-style in train)
                if self.mode == "train":
                    t = (srng.randint(0, self.num_frames)
                         if self.frame_use < 0 else self.frame_use)
                else:
                    t = (self.num_frames // 2 if self.frame_use < 0
                         else self.frame_use)
                f = s.frames[t: t + 1]
            else:
                f = s.frames[:frames_per_sample]
            wavs.append(s.waveform)
            frames.append(f)
            labels.append(s.labels)
        return (np.stack(wavs), np.stack(frames), np.stack(labels),
                np.asarray(lens, dtype=np.int32))


# ----------------------------------------------------------------------
# Device-side fused transforms
# ----------------------------------------------------------------------

def _images_from_u8(frames_u8: jnp.ndarray, im_res: int) -> jnp.ndarray:
    """uint8 [B, T, H, W, 3] -> normalized float [B, T, 3, im_res, im_res]."""
    x = frames_u8.astype(jnp.float32) / 255.0
    B, T, H, W, _ = x.shape
    if (H, W) != (im_res, im_res):
        x = jax.image.resize(x, (B, T, im_res, im_res, 3), method="bicubic")
    x = x.transpose(0, 1, 4, 2, 3)  # -> [B, T, 3, H, W]
    return aug.normalize_image(x)


def _fbank_with_ref_padding(cfg: AudioConfig, wav, wav_len):
    """Device fbank over the fixed-size padded waveform, with rows beyond
    each clip's TRUE frame count zeroed — matching the reference's behavior
    of computing fbank on the real clip and zero-padding the ROWS
    (dataloader.py:333-343), instead of log-eps rows from padded silence."""
    fb = kaldi_fbank(wav, sample_freq=float(cfg.sample_rate),
                     num_mel_bins=cfg.num_mel_bins,
                     frame_length_ms=cfg.frame_length_ms,
                     frame_shift_ms=cfg.frame_shift_ms)
    fb = pad_or_crop_frames(fb, cfg.target_length)
    if wav_len is not None:
        ws = int(cfg.sample_rate * cfg.frame_length_ms / 1000.0)
        sh = int(cfg.sample_rate * cfg.frame_shift_ms / 1000.0)
        n_valid = 1 + jnp.maximum(wav_len - ws, 0) // sh  # snip_edges count
        rows = jnp.arange(cfg.target_length)[None, :]
        fb = jnp.where(rows[..., None] < n_valid[:, None, None], fb, 0.0)
    return fb


def make_train_transform(cfg: AudioConfig, im_res: int = 224,
                         single_frame: bool = True):
    """jit fn(rng, wav [B,n], frames_u8 [B,T,H,W,3], labels [B,C],
    wav_len [B]) -> (fbank [B,1024,128], image, labels). Applies mixup (if
    cfg.mixup>0), fbank, SpecAug, normalize, noise/roll."""

    @jax.jit
    def f(rng, wav, frames_u8, labels, wav_len=None):
        k_mix, k_coin, k_lam, k_imgw, k_spec, k_noise = jax.random.split(rng, 6)
        B = wav.shape[0]
        img = _images_from_u8(frames_u8, im_res)
        if single_frame:
            img = img[:, 0]
        if cfg.mixup > 0:
            perm = jax.random.permutation(k_mix, B)
            coin = jax.random.uniform(k_coin, (B,)) < cfg.mixup
            lam = jnp.where(coin, aug.mixup_lambda(k_lam, B), 1.0)
            wav = aug.mixup_waveform(lam, wav, wav[perm])
            # mixed clip keeps the FIRST clip's length (the reference pads or
            # crops the partner to waveform1's length, dataloader.py:314-325)
            w_img = jnp.where(coin, jax.random.uniform(k_imgw, (B,)), 1.0)
            bshape = (B,) + (1,) * (img.ndim - 1)
            img = (w_img.reshape(bshape) * img
                   + (1.0 - w_img.reshape(bshape)) * img[perm])
            lam_l = lam[:, None]
            labels = lam_l * labels + (1.0 - lam_l) * labels[perm]
        fb = _fbank_with_ref_padding(cfg, wav, wav_len)
        fb = aug.spec_augment(k_spec, fb, cfg.freqm, cfg.timem)
        if not cfg.skip_norm:
            fb = aug.normalize_fbank(fb, cfg.norm_mean, cfg.norm_std)
        if cfg.noise:
            fb = aug.noise_and_roll(k_noise, fb, cfg.target_length)
        return fb, img, labels

    return f


def make_eval_transform(cfg: AudioConfig, im_res: int = 224,
                        single_frame: bool = False):
    """Eval: fbank + normalize only; all frames kept (multi-frame ensemble)."""

    @jax.jit
    def f(wav, frames_u8, labels, wav_len=None):
        img = _images_from_u8(frames_u8, im_res)
        if single_frame:
            img = img[:, 0]
        fb = _fbank_with_ref_padding(cfg, wav, wav_len)
        if not cfg.skip_norm:
            fb = aug.normalize_fbank(fb, cfg.norm_mean, cfg.norm_std)
        return fb, img, labels

    return f
