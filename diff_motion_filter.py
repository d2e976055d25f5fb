"""Optical-flow camera/object mask tuning visualizer — parity with the
reference ``diff_motion_filter.py``: sweep flow-mask thresholds over a video
and dump mask overlays for inspection."""

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--video_path", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="flow_masks")
    p.add_argument("--frames_apart", type=int, default=15)
    p.add_argument("--s_window_sizes", type=int, nargs="+",
                   default=[16, 32, 64])
    p.add_argument("--direction_thresholds", type=float, nargs="+",
                   default=[0.3, 0.4, 0.5])
    p.add_argument("--mask_video_ratio", type=float, default=0.5)
    return p.parse_args()


def main():
    args = parse_args()

    import cv2
    import numpy as np

    from hivae_tpu.data import video as vio
    from hivae_tpu.data.flow_mask import flow_mask

    total, fps = vio.video_metadata(args.video_path)
    last = min(args.frames_apart, total - 1)
    frames = vio.read_video_frames(args.video_path, np.array([0, last]))
    f1, f2 = frames[0], frames[1]

    os.makedirs(args.output_dir, exist_ok=True)
    name = os.path.splitext(os.path.basename(args.video_path))[0]
    base = cv2.resize(f1, (256, 256))

    for sw in args.s_window_sizes:
        for dt in args.direction_thresholds:
            cam, obj = flow_mask(f1, f2, s_window_size=sw,
                                 direction_threshold=dt,
                                 mask_video_ratio=args.mask_video_ratio)
            for tag, mask in [("camera", cam), ("object", obj)]:
                m = cv2.resize((mask * 255).astype(np.uint8), (256, 256),
                               interpolation=cv2.INTER_NEAREST)
                overlay = base.copy()
                overlay[..., 1] = np.maximum(overlay[..., 1], m)
                out = os.path.join(
                    args.output_dir,
                    f"{name}_sw{sw}_dt{dt}_{tag}.png")
                cv2.imwrite(out, cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR))
                print("saved:", out)


if __name__ == "__main__":
    main()
