"""Text conditioning for the t2m head.

The reference conditions free text through a frozen HF CLIP text encoder
(reference ``text2motion/modules.py:272-297`` ``TextEncoder``). The TPU
build treats text like audio (whisper): embeddings are computed on the host
— by the real CLIP model when a local checkpoint is available, otherwise by
a deterministic spectral-hash fallback with the same shape contract — and
enter the jitted graph as plain arrays
(``Label2MotionDiffusionDecoder`` accepts ``label`` as a float embedding,
``models/t2m.py``).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


class TextEncoder:
    """Frozen CLIP text encoder with a deterministic fallback.

    ``__call__(texts)`` -> (sequence (N, 77, width), pooled (N, width)),
    mirroring the reference's ``TextEncoder.forward`` return pair.
    """

    def __init__(self, model_path: Optional[str] = None, width: int = 512,
                 max_length: int = 77):
        self.width = width
        self.max_length = max_length
        self._model = None
        self._tokenizer = None
        if model_path:
            try:
                from transformers import CLIPTextModel, CLIPTokenizer

                self._tokenizer = CLIPTokenizer.from_pretrained(model_path)
                self._model = CLIPTextModel.from_pretrained(model_path).eval()
                self.width = self._model.config.hidden_size
            except Exception as e:  # pragma: no cover - weights optional
                print(f"CLIP unavailable ({e}); using deterministic fallback")

    def __call__(self, texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        if self._model is not None:
            import torch

            batch = self._tokenizer(
                texts, truncation=True, max_length=self.max_length,
                padding="max_length", return_tensors="pt")
            with torch.no_grad():
                out = self._model(input_ids=batch["input_ids"])
            return (out.last_hidden_state.numpy(),
                    out.pooler_output.numpy())
        seq = np.stack([self._fallback_sequence(t) for t in texts])
        return seq, seq.mean(axis=1)

    def _fallback_sequence(self, text: str) -> np.ndarray:
        """Deterministic per-token embedding: each whitespace token is
        hashed to a seed driving a unit-normal draw; padded to max_length.
        Distinct texts map to distinct, reproducible embeddings."""
        import hashlib

        tokens = text.lower().split()[: self.max_length]
        rows = []
        for tok in tokens:
            seed = int.from_bytes(
                hashlib.sha256(tok.encode()).digest()[:4], "little")
            rows.append(np.random.RandomState(seed).randn(
                self.width).astype(np.float32))
        while len(rows) < self.max_length:
            rows.append(np.zeros(self.width, np.float32))
        return np.stack(rows)


def load_text_embedding(path: str) -> np.ndarray:
    """Load a precomputed pooled CLIP embedding (.npy) for conditioning."""
    return np.load(path).astype(np.float32)
