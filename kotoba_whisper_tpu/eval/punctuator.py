"""Punctuation-restoration add-on.

Counterpart of misc/whisper_add_on/punctuator.py: the reference wraps an
ONNX multilingual punctuation model and applies it per pipeline chunk with
a ja-specific guard — only accept the punctuated text when it differs from
the original purely by punctuation characters (:13-30). The model itself is
pluggable (`punctuate_fn`); `RuleBasedJaPunctuator` provides a dependency-
free default (sentence-final 。 insertion), and the validation/application
logic matches the reference.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Sequence

PUNCT_CHARS = "。、．，!?！？.,"


def strip_punct(s: str) -> str:
    return "".join(c for c in s if c not in PUNCT_CHARS)


@dataclass
class RuleBasedJaPunctuator:
    """Minimal default: append 。 to chunk-final text lacking terminal
    punctuation."""

    def __call__(self, texts: Sequence[str]) -> list[str]:
        out = []
        for t in texts:
            t2 = t.rstrip()
            if t2 and t2[-1] not in PUNCT_CHARS:
                t2 = t2 + "。"
            out.append(t2)
        return out


@dataclass
class Punctuator:
    punctuate_fn: Callable[[Sequence[str]], list[str]] = field(
        default_factory=RuleBasedJaPunctuator
    )

    def punctuate(self, chunks: list[dict]) -> list[dict]:
        """Apply to pipeline chunks; keep the model output only when it is
        the same text modulo punctuation (the reference's validation)."""
        texts = [c["text"] for c in chunks]
        restored = self.punctuate_fn(texts)
        out = []
        for c, r in zip(chunks, restored):
            ok = strip_punct(r) == strip_punct(c["text"])
            out.append({**c, "text": r if ok else c["text"]})
        return out
