"""Host input-pipeline throughput: threaded DataLoader frames/s.

The loader must outrun the train step's consumption (696M AMD_N eats
~52 frames/s/chip, benchmarks/RESULTS.md) or the chip starves. The
reference's answer is a 16-worker torch DataLoader (train_amd.py
--dataloader_num_workers); ours is the threaded prefetching loader in
hivae_tpu/data/datasets.py (cv2 releases the GIL during decode).
"""

import argparse
import os
import tempfile
import time

import numpy as np


def make_videos(root, n=8, frames=64, size=256, fps=8):
    import cv2
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        path = os.path.join(root, f"clip{i:02d}.mp4")
        if os.path.exists(path):
            continue
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                            (size, size))
        rng = np.random.default_rng(i)
        x, y = rng.integers(32, size - 32, 2)
        for t in range(frames):
            img = np.full((size, size, 3), 30, np.uint8)
            cx = int(x + 60 * np.sin(t / 7 + i))
            cy = int(y + 60 * np.cos(t / 9 + i))
            cv2.circle(img, (cx % size, cy % size), 24,
                       (int(80 + 20 * i) % 255, 160, 90), -1)
            w.write(img)
        w.release()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video_dir", default=None)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--batches", type=int, default=40)
    p.add_argument("--grey", type=lambda v: v.lower() == "true",
               default=True, help="--grey false disables the grey twin stream")
    args = p.parse_args()

    from hivae_tpu.data.datasets import DataLoader, VideoClipDataset

    root = args.video_dir or os.path.join(tempfile.gettempdir(),
                                          "hivae_bench_videos")
    if args.video_dir is None:
        make_videos(root)

    ds = VideoClipDataset(root, sample_n_frames=args.frames,
                          sample_size=256, use_grey=args.grey)
    loader = DataLoader(ds, args.batch, num_workers=args.workers,
                        prefetch=4)

    it = iter(loader)
    next(it)  # warm caches/threads
    t0 = time.perf_counter()
    n = 0
    for _ in range(args.batches - 1):
        try:
            next(it)
        except StopIteration:
            it = iter(loader)
            next(it)
        n += 1
    dt = time.perf_counter() - t0
    fps = n * args.batch * args.frames / dt
    print(f"{args.workers} workers, batch {args.batch}x{args.frames}f"
          f"{' +grey' if args.grey else ''}: "
          f"{n / dt:.2f} batches/s = {fps:.0f} frames/s (host)")


if __name__ == "__main__":
    main()
