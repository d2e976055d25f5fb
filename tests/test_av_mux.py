"""Audio muxing into generated videos (reference export_video_with_audio,
model/pipeline.py:210-263). No ffmpeg in this image, so the pure-Python
RIFF/AVI fallback is the path under test; the ffmpeg branch shares the trim
math through read_wav_segment."""

import os
import struct
import wave

import numpy as np
import pytest

from hivae_tpu.data.av_mux import (export_video_with_audio,
                                   read_wav_segment, write_avi_with_audio)
from hivae_tpu.data.video import write_video


def _make_wav(path, seconds=2.0, rate=16000, freq=440.0):
    t = np.arange(int(seconds * rate)) / rate
    pcm = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return pcm


def _frames(f=8, h=48, w=64):
    rng = np.random.RandomState(0)
    return rng.randint(0, 255, (f, h, w, 3), dtype=np.uint8)


class TestWavSegment:
    def test_full_read(self, tmp_path):
        p = tmp_path / "a.wav"
        ref = _make_wav(p, seconds=1.0)
        rate, pcm = read_wav_segment(str(p))
        assert rate == 16000
        np.testing.assert_array_equal(pcm[:, 0], ref)

    def test_trim_matches_ffmpeg_ss_t(self, tmp_path):
        p = tmp_path / "a.wav"
        ref = _make_wav(p, seconds=2.0)
        rate, pcm = read_wav_segment(str(p), start=0.5, duration=0.25)
        assert len(pcm) == 4000
        np.testing.assert_array_equal(pcm[:, 0], ref[8000:12000])


class TestAviMux:
    def _parse_streams(self, path):
        data = open(path, "rb").read()
        assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
        return data

    def test_container_has_audio_stream(self, tmp_path):
        out = tmp_path / "v.avi"
        rate, pcm = 16000, np.zeros((16000, 1), "<i2")
        pcm[:, 0] = (np.sin(np.arange(16000)) * 1000).astype("<i2")
        write_avi_with_audio(str(out), _frames(), 8.0, rate, pcm)
        data = self._parse_streams(out)
        assert b"auds" in data          # audio stream header declared
        assert b"01wb" in data          # interleaved PCM chunks present
        assert b"00dc" in data and b"MJPG" in data

    def test_video_readable_by_cv2(self, tmp_path):
        import cv2

        out = tmp_path / "v.avi"
        frames = _frames(f=6)
        write_avi_with_audio(str(out), frames, 8.0, 16000,
                             np.zeros((12000, 1), "<i2"))
        cap = cv2.VideoCapture(str(out))
        n = 0
        while True:
            ok, img = cap.read()
            if not ok:
                break
            assert img.shape == (48, 64, 3)
            n += 1
        cap.release()
        assert n == 6

    def test_audio_duration_matches_video(self, tmp_path):
        """The mux trims the wav to F/fps seconds of samples."""
        wav = tmp_path / "drv.wav"
        _make_wav(wav, seconds=3.0)
        out = export_video_with_audio(str(tmp_path / "o.mp4"), _frames(f=8),
                                      8.0, str(wav), audio_start=0.5)
        assert out.endswith(".avi")  # no ffmpeg in this image
        data = open(out, "rb").read()
        data = data[:data.rfind(b"idx1")]  # the index repeats the fourccs
        # sum the 01wb chunk payloads: 1.0 s of 16 kHz mono s16 = 32000 B
        total, i = 0, 0
        while True:
            i = data.find(b"01wb", i)
            if i < 0:
                break
            (size,) = struct.unpack("<I", data[i + 4:i + 8])
            total += size
            i += 8 + size
        assert total == 32000


class TestWriteVideoAudioPath:
    def test_write_video_muxes(self, tmp_path):
        wav = tmp_path / "drv.wav"
        _make_wav(wav, seconds=2.0)
        out = write_video(str(tmp_path / "gen.mp4"), _frames(), fps=8.0,
                          audio_path=str(wav))
        assert os.path.exists(out)
        assert b"auds" in open(out, "rb").read()

    def test_silent_path_unchanged(self, tmp_path):
        out = write_video(str(tmp_path / "gen.mp4"), _frames(), fps=8.0)
        assert out.endswith(".mp4") and os.path.exists(out)
