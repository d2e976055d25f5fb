"""Offline CLIP text-embedding extraction (the t2m analogue of
get_whisper_emb.py; reference free-text path: text2motion/modules.py:272-297).

Reads captions (one per line, or "name<TAB>caption"), writes one pooled
embedding .npy per caption into --output_dir. Pass --clip_path for real CLIP
weights; otherwise the deterministic fallback encoder is used.

Usage:
  python get_clip_emb.py --captions caps.txt --output_dir embs/ \
      [--clip_path openai/clip-vit-base-patch32] [--save_sequence]
"""

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--captions", type=str, required=True,
                   help="text file: 'caption' or 'name\\tcaption' per line")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--clip_path", type=str, default=None)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--save_sequence", action="store_true",
                   help="also save the (77, D) token sequence")
    return p.parse_args()


def main():
    import numpy as np

    from hivae_tpu.data.text import TextEncoder

    args = parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    enc = TextEncoder(args.clip_path, width=args.width)

    names, texts = [], []
    with open(args.captions) as f:
        for i, line in enumerate(f):
            line = line.rstrip("\n")
            if not line.strip():
                continue
            if "\t" in line:
                name, text = line.split("\t", 1)
            else:
                name, text = f"caption_{i:05d}", line
            names.append(name)
            texts.append(text)

    seq, pooled = enc(texts)
    for name, s, z in zip(names, seq, pooled):
        np.save(os.path.join(args.output_dir, f"{name}.npy"), z)
        if args.save_sequence:
            np.save(os.path.join(args.output_dir, f"{name}_seq.npy"), s)
    print(f"wrote {len(names)} embeddings (dim {pooled.shape[-1]}) "
          f"to {args.output_dir}")


if __name__ == "__main__":
    main()
