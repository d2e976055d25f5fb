"""Optical-flow camera/object mask tuning visualizer — parity with the
reference ``diff_motion_filter.py`` (single clip) and
``diff_motion_filter_two_sample.py`` (two-interval comparison): sweep
flow-mask thresholds and dump mask overlays for inspection.

Two-sample mode (``--two_sample`` or ``--video_path_2``): computes the
camera mask over two frame intervals — [0, frames_apart] and
[frames_apart, 2*frames_apart] of the same clip, or the first interval of
each of two clips — keeps only per-window-consistent white windows, and
applies the reference's 32-window white budget (reference
``diff_motion_filter_two_sample.py:228-261``)."""

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
    p.add_argument("--two_sample", action="store_true",
                   help="compare masks across two frame intervals")
    p.add_argument("--video_path_2", type=str, default=None,
                   help="second clip for two-sample mode (defaults to "
                        "--video_path with a shifted interval)")
    p.add_argument("--max_white_windows", type=int, default=32,
                   help="two-sample white-window budget (reference :250)")
    return p.parse_args()


def two_sample_mask(cam1, cam2, s_window_size=32, max_white=32, rng=None):
    """Window-wise intersection of two camera masks + white budget
    (reference diff_motion_filter_two_sample.py:228-261). Masks are (H, W)
    float in {0,1}; windows are in mask resolution units."""
    import numpy as np

    rng = rng or np.random
    h, w = cam1.shape
    out = np.zeros_like(cam1)
    white = []
    for y in range(0, h, s_window_size):
        for x in range(0, w, s_window_size):
            w1 = cam1[y:y + s_window_size, x:x + s_window_size]
            w2 = cam2[y:y + s_window_size, x:x + s_window_size]
            if np.array_equal(w1, w2) and np.any(w1 == 1):
                out[y:y + s_window_size, x:x + s_window_size] = 1
                white.append((y, x))
    if len(white) > max_white:
        idx = rng.permutation(len(white))[max_white:]
        for i in idx:
            y, x = white[i]
            out[y:y + s_window_size, x:x + s_window_size] = 0
    return out


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

    two_sample = args.two_sample or args.video_path_2 is not None
    if two_sample:
        if args.video_path_2:
            t2, _ = vio.video_metadata(args.video_path_2)
            fr2 = vio.read_video_frames(
                args.video_path_2, np.array([0, min(args.frames_apart,
                                                    t2 - 1)]))
            g1, g2 = fr2[0], fr2[1]
        else:
            mid, end = last, min(2 * args.frames_apart, total - 1)
            fr2 = vio.read_video_frames(args.video_path,
                                        np.array([mid, end]))
            g1, g2 = fr2[0], fr2[1]

    os.makedirs(args.output_dir, exist_ok=True)
    name = os.path.splitext(os.path.basename(args.video_path))[0]
    base = cv2.resize(f1, (256, 256))

    for sw in args.s_window_sizes:
        for dt in args.direction_thresholds:
            cam, obj = flow_mask(f1, f2, s_window_size=sw,
                                 direction_threshold=dt,
                                 mask_video_ratio=args.mask_video_ratio)
            pairs = [("camera", cam), ("object", obj)]
            if two_sample:
                cam2, _ = flow_mask(g1, g2, s_window_size=sw,
                                    direction_threshold=dt,
                                    mask_video_ratio=args.mask_video_ratio)
                # masks are 32x32 (mask-space window = sw // 8)
                joint = two_sample_mask(cam, cam2,
                                        max(1, sw // 8),
                                        args.max_white_windows)
                pairs.append(("camera_two_sample", joint))
            for tag, mask in pairs:
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
