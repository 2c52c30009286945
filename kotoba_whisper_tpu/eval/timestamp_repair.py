"""Timestamp repair post-processing (stable-ts add-on equivalent).

Counterpart of misc/whisper_add_on/stable_timestamp.py: fill missing chunk
start/end times from neighbors and the median chunk duration (:12-53), and
clamp/monotonicize the result (the adjust/regroup step :60-75 operates on
silence detection, which needs the waveform; the geometric repair here
covers the None-fill and ordering invariants the reference enforces).

Chunks follow the pipeline schema: {"timestamp": (start, end), "text"}.
"""
from __future__ import annotations

import numpy as np


def repair_timestamps(chunks: list[dict], audio_duration_s: float | None = None) -> list[dict]:
    if not chunks:
        return chunks
    starts = [c["timestamp"][0] for c in chunks]
    ends = [c["timestamp"][1] for c in chunks]

    durations = [
        e - s for s, e in zip(starts, ends) if s is not None and e is not None
    ]
    median_dur = float(np.median(durations)) if durations else 2.0

    # forward fill starts from previous end
    for i in range(len(chunks)):
        if starts[i] is None:
            starts[i] = ends[i - 1] if i > 0 and ends[i - 1] is not None else 0.0
        if ends[i] is None:
            nxt = starts[i + 1] if i + 1 < len(chunks) else None
            if nxt is not None:
                ends[i] = nxt
            elif audio_duration_s is not None:
                ends[i] = min(starts[i] + median_dur, audio_duration_s)
            else:
                ends[i] = starts[i] + median_dur

    # monotonic, non-negative, start <= end
    prev_end = 0.0
    out = []
    for c, s, e in zip(chunks, starts, ends):
        s = max(float(s), prev_end)
        e = max(float(e), s)
        if audio_duration_s is not None:
            s, e = min(s, audio_duration_s), min(e, audio_duration_s)
        prev_end = e
        out.append({**c, "timestamp": (round(s, 2), round(e, 2))})
    return out
