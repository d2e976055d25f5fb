"""Offline whisper-embedding extraction — parity with the reference
``dataset/get_whisper_emb.py``: per-video audio -> per-frame (M, D) encoder
features saved to disk for the A2M trainers.

Uses transformers' WhisperModel encoder (local checkpoint dir); audio is
chunked so every video frame gets an (audio_blocks, D) window. Without
whisper weights the script falls back to the AudioProcessor filterbank
features (same file contract) so downstream training remains runnable.
"""

import argparse
import glob
import os


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--video_dir", type=str, required=True,
                   help="tree containing .mp4 files with .wav siblings")
    p.add_argument("--output_dir", type=str, default="whisper_emb")
    p.add_argument("--whisper_path", type=str, default=None,
                   help="local whisper-tiny checkpoint dir")
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--audio_blocks", type=int, default=50)
    return p.parse_args()


def extract_whisper(model, waveform, sr, num_frames, blocks, fps):
    import numpy as np
    import torch
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()
    feats = fe(waveform, sampling_rate=sr, return_tensors="pt")
    with torch.no_grad():
        enc = model.encoder(feats.input_features).last_hidden_state[0]
    # enc: (1500, D) covering the 30s-PADDED window at a fixed 50 rows/sec.
    # Frames map by TIME (frame f sits at f/fps sec -> row f/fps*50),
    # never by dividing 1500 across the frame count — that would spread a
    # short clip's frames into the silence padding and misalign every
    # audio-driven embedding.
    rows_per_sec = enc.shape[0] / 30.0
    d = enc.shape[-1]
    out = np.zeros((num_frames, blocks, d), np.float32)
    for f in range(num_frames):
        start = int(f / fps * rows_per_sec)
        chunk = enc[start:start + blocks].numpy()
        out[f, :chunk.shape[0]] = chunk
    return out


def main():
    args = parse_args()

    import numpy as np

    from hivae_tpu.data import video as vio
    from hivae_tpu.data.audio import AudioProcessor, read_wav

    model = None
    if args.whisper_path and os.path.exists(args.whisper_path):
        from transformers import WhisperModel

        model = WhisperModel.from_pretrained(args.whisper_path)
        model.eval()
    # whisper-tiny contract: (T, blocks, 384); the fallback must emit the
    # same per-frame width (one feature set, not wav2vec's 13 states)
    fallback = AudioProcessor(features_per_frame=384,
                              only_last_features=True)

    os.makedirs(args.output_dir, exist_ok=True)
    videos = sorted(glob.glob(os.path.join(args.video_dir, "**", "*.mp4"),
                              recursive=True))
    for vp in videos:
        wav_path = os.path.splitext(vp)[0] + ".wav"
        if not os.path.exists(wav_path):
            print(f"skip (no wav): {vp}")
            continue
        try:
            total, fps = vio.video_metadata(vp)
            wav = read_wav(wav_path)
            if model is not None:
                emb = extract_whisper(model, wav, 16000, total,
                                      args.audio_blocks, fps)
            else:
                flat = fallback(wav, total)  # (T, D)
                emb = np.repeat(flat[:, None], args.audio_blocks, axis=1)
            name = os.path.splitext(os.path.basename(vp))[0]
            # sidecar contract: {video stem}.npy — what build_index._find_sidecar
            # and vis.py pair on (a *_emb suffix would orphan every file)
            np.save(os.path.join(args.output_dir, f"{name}.npy"), emb)
            print(f"{vp}: {emb.shape}")
        except Exception as e:
            print(f"FAILED {vp}: {e}")


if __name__ == "__main__":
    main()
