"""Dataset index builder — parity with the reference ``dataset/
data_preprocess.py``: pair videos with whisper-embedding files (and
optionally DWPose videos), validate them in a worker pool, and write
train/eval pkl index lists consumable by ``VideoAudioDataset``.

Unlike the reference (hardcoded cluster paths), all roots are flags.
"""

import argparse
import glob
import os
import pickle
import random
from concurrent.futures import ThreadPoolExecutor


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--video_dir", type=str, required=True)
    p.add_argument("--audio_emb_dir", type=str, default=None,
                   help="*.npy/*.pt whisper embeddings named like videos")
    p.add_argument("--pose_video_dir", type=str, default=None,
                   help="DWPose mp4s named like videos")
    p.add_argument("--output", type=str, default="index.pkl")
    p.add_argument("--eval_output", type=str, default=None)
    p.add_argument("--eval_num", type=int, default=0,
                   help="hold out N entries for the eval list")
    p.add_argument("--min_frames", type=int, default=17)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def _find_sidecar(root, name, exts):
    for stem in (name, name + "_emb"):  # tolerate legacy *_emb.npy files
        for ext in exts:
            cand = os.path.join(root, stem + ext)
            if os.path.exists(cand):
                return cand
    return None


def main():
    args = parse_args()

    from hivae_tpu.data import video as vio

    videos = sorted(glob.glob(os.path.join(args.video_dir, "**", "*.mp4"),
                              recursive=True))

    def check(vp):
        name = os.path.splitext(os.path.basename(vp))[0]
        try:
            total, fps = vio.video_metadata(vp)
        except Exception as e:
            return None, f"{vp}: unreadable ({e})"
        if total < args.min_frames:
            return None, f"{vp}: only {total} frames"
        entry = {"video_path": vp}
        if args.audio_emb_dir:
            emb = _find_sidecar(args.audio_emb_dir, name, (".npy", ".pt"))
            if emb is None:
                return None, f"{vp}: no audio embedding"
            entry["audio_emb_path"] = emb
        if args.pose_video_dir:
            pose = _find_sidecar(args.pose_video_dir, name, (".mp4",))
            if pose is None:
                return None, f"{vp}: no pose video"
            entry["pose_path"] = pose
        return entry, None

    with ThreadPoolExecutor(max_workers=args.num_workers) as pool:
        results = list(pool.map(check, videos))
    entries = [e for e, _ in results if e is not None]
    skipped = [msg for _, msg in results if msg is not None]
    for msg in skipped[:20]:
        print("skip:", msg)
    if len(skipped) > 20:
        print(f"... and {len(skipped) - 20} more skipped")

    random.Random(args.seed).shuffle(entries)
    eval_entries = entries[:args.eval_num]
    train_entries = entries[args.eval_num:]

    with open(args.output, "wb") as f:
        pickle.dump(train_entries, f)
    print(f"wrote {len(train_entries)} train entries -> {args.output}")
    if args.eval_output and eval_entries:
        with open(args.eval_output, "wb") as f:
            pickle.dump(eval_entries, f)
        print(f"wrote {len(eval_entries)} eval entries -> {args.eval_output}")


if __name__ == "__main__":
    main()
