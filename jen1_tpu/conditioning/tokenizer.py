"""Tokenizers for the text conditioner.

Primary: the HF T5 tokenizer via `transformers.AutoTokenizer` (requires local
files in a no-egress environment). Fallback: a deterministic, dependency-free
byte-level tokenizer so the full pipeline runs hermetically — the conditioner
contract only needs (ids, mask) of fixed length (reference pads to
max_length=128: jen1/conditioners.py:89-95).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


class ByteTokenizer:
    """UTF-8 bytes -> ids in [3, 258]; 0 = pad, 1 = eos. Deterministic."""

    vocab_size = 259
    pad_id = 0
    eos_id = 1

    def __call__(
        self, texts: List[str], max_length: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        ids = np.zeros((len(texts), max_length), dtype=np.int32)
        mask = np.zeros((len(texts), max_length), dtype=bool)
        for i, text in enumerate(texts):
            raw = list(text.encode("utf-8"))[: max_length - 1]
            seq = [b + 3 for b in raw] + [self.eos_id]
            ids[i, : len(seq)] = seq
            mask[i, : len(seq)] = True
        return ids, mask


class HFTokenizer:
    """transformers AutoTokenizer wrapper with pad-to-max_length semantics."""

    def __init__(self, model_name_or_path: str):
        from transformers import AutoTokenizer

        try:
            # Local cache / path first: on a no-egress host the network
            # attempt stalls through 5 hub retries (~60 s) before failing.
            self._tok = AutoTokenizer.from_pretrained(
                model_name_or_path, local_files_only=True
            )
        except OSError:
            import socket

            try:  # fail fast when the hub is unreachable (no-egress host)
                socket.getaddrinfo("huggingface.co", 443)
            except OSError as e:
                raise OSError(
                    f"no local files for {model_name_or_path!r} and "
                    f"huggingface.co is unreachable: {e}"
                ) from e
            self._tok = AutoTokenizer.from_pretrained(model_name_or_path)
        self.vocab_size = self._tok.vocab_size

    def __call__(
        self, texts: List[str], max_length: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        enc = self._tok(
            texts,
            truncation=True,
            max_length=max_length,
            padding="max_length",
            return_tensors="np",
        )
        return (
            enc["input_ids"].astype(np.int32),
            enc["attention_mask"].astype(bool),
        )


def get_tokenizer(model_name_or_path: Optional[str] = None):
    """Prefer the real T5 tokenizer when its files are available locally;
    warn loudly on fallback (ADVICE r1: conditioning through the byte
    tokenizer against T5 weights produces garbage token ids silently)."""
    if model_name_or_path is not None:
        try:
            return HFTokenizer(model_name_or_path)
        except Exception as e:  # noqa: BLE001
            import warnings

            warnings.warn(
                f"jen1_tpu: could not load the HF tokenizer for "
                f"{model_name_or_path!r} ({type(e).__name__}); falling back "
                "to the byte-level tokenizer. Token ids will NOT match T5 "
                "vocabulary — fine for hermetic tests, wrong for pretrained "
                "T5 weights.",
                UserWarning,
                stacklevel=2,
            )
    return ByteTokenizer()
