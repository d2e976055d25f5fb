"""Audio feature extraction (host-side) for the A2M/A2P heads.

Capability parity with the reference audio stack:

  * ``linear_interpolation`` + ``AudioProcessor`` ~ the wav2vec path
    (reference ``dataset/audio_processor.py:9-169``): a Wav2Vec2 encoder with
    hidden states linearly interpolated to the video frame count and all
    layers concatenated on the feature axis.
  * ``load_whisper_embedding`` ~ the precomputed whisper-tiny embeddings the
    A2M trainers consume (reference ``dataset/get_whisper_emb.py:122-153``:
    per-frame (50, 384) chunks saved to disk).

Model weights load from a local HF checkpoint directory (the reference also
hardcodes local paths); in weightless environments the processor degrades to
a deterministic mel-style filterbank feature so pipelines stay runnable.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import torch
import torch.nn.functional as F


def linear_interpolation(features: torch.Tensor, seq_len: int) -> torch.Tensor:
    """(B, T, C) -> (B, seq_len, C) via linear interp on the time axis
    (reference ``audio_processor.py:9-12``)."""
    features = features.transpose(1, 2)
    out = F.interpolate(features, size=seq_len, align_corners=True,
                        mode="linear")
    return out.transpose(1, 2)


class AudioProcessor:
    """wav2vec2 feature extractor with per-frame interpolation.

    ``model_path``: local Wav2Vec2 checkpoint dir; when None/missing, a
    filterbank fallback of the same shape contract is used.
    """

    def __init__(self, model_path: Optional[str] = None,
                 sampling_rate: int = 16000, features_per_frame: int = 768,
                 only_last_features: bool = False,
                 num_hidden_states: int = 13):
        self.sampling_rate = sampling_rate
        self.only_last_features = only_last_features
        self.features_per_frame = features_per_frame
        # wav2vec2-base emits 13 hidden states (12 layers + embeddings);
        # the fallback must honor the SAME width contract as the real
        # model or pipelines dimensioned in one environment crash in the
        # other
        self.num_hidden_states = num_hidden_states
        self.model = None
        if model_path and os.path.exists(model_path):
            from transformers import Wav2Vec2Model

            self.model = Wav2Vec2Model.from_pretrained(model_path)
            self.model.eval()

    @torch.no_grad()
    def __call__(self, waveform: np.ndarray, video_frames: int) -> np.ndarray:
        """waveform (T,) float mono 16kHz -> (video_frames, D) features,
        D = hidden * num_layers (all hidden states concatenated)."""
        wav = torch.from_numpy(np.asarray(waveform, np.float32))[None]
        if self.model is not None:
            out = self.model(wav, output_hidden_states=True)
            if self.only_last_features:
                states = [out.last_hidden_state]
            else:
                states = list(out.hidden_states)
            feats = [linear_interpolation(h, video_frames) for h in states]
            return torch.cat(feats, dim=-1)[0].numpy()
        return self._filterbank(wav, video_frames)

    def _filterbank(self, wav: torch.Tensor, video_frames: int) -> np.ndarray:
        """Deterministic spectral fallback: framed log-magnitude STFT
        projected to ``features_per_frame`` dims."""
        n_fft = 512
        spec = torch.stft(wav[0], n_fft=n_fft, hop_length=n_fft // 2,
                          return_complex=True, center=True,
                          window=torch.hann_window(n_fft))
        logmag = torch.log1p(spec.abs()).T[None]  # (1, T, F)
        feats = linear_interpolation(logmag, video_frames)[0]
        d = self.features_per_frame * (1 if self.only_last_features
                                       else self.num_hidden_states)
        reps = -(-d // feats.shape[-1])
        return feats.repeat(1, reps)[:, :d].numpy()


def load_whisper_embedding(path: str) -> np.ndarray:
    """Load a precomputed whisper embedding file (.npy or torch .pt) ->
    (T, M, D) float32 (the reference saves (T, 50, 384))."""
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    emb = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(emb, torch.Tensor):
        return emb.float().numpy()
    return np.asarray(emb, np.float32)


def read_wav(path: str, target_rate: int = 16000) -> np.ndarray:
    """Mono float32 waveform at ``target_rate`` using the stdlib/scipy."""
    from scipy.io import wavfile

    rate, data = wavfile.read(path)
    # scale by the SOURCE dtype, not a magnitude heuristic: int32 PCM
    # divided by 32768 would span +-65536 and uint8 carries a +128 offset
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:  # float wavs are already in [-1, 1]
        data = np.asarray(data, np.float32)
    if data.ndim == 2:
        data = data.mean(axis=1)
    if rate != target_rate:
        n_out = int(len(data) * target_rate / rate)
        x_old = np.linspace(0, 1, len(data))
        x_new = np.linspace(0, 1, n_out)
        data = np.interp(x_new, x_old, data).astype(np.float32)
    return data
