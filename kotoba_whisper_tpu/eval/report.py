"""Metric reporting: markdown pivot tables over the metric JSONL records.

Counterpart of run_short_form_eval.py's `--pretty-table` mode (:56-103):
pivot model x dataset for a chosen metric, rendered as GitHub markdown.
"""
from __future__ import annotations

import json
import os
from collections import defaultdict


def load_metrics(path: str) -> list[dict]:
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def pivot_table(
    records: list[dict], metric: str = "cer_norm", digits: int = 1
) -> str:
    """model x dataset markdown pivot; last record wins per cell."""
    cells: dict[str, dict[str, float]] = defaultdict(dict)
    datasets: list[str] = []
    for r in records:
        if metric not in r:
            continue
        ds = str(r.get("dataset", "?"))
        cells[str(r.get("model", "?"))][ds] = r[metric]
        if ds not in datasets:
            datasets.append(ds)
    if not cells:
        return "(no records)"

    header = "| model | " + " | ".join(datasets) + " |"
    sep = "|" + "---|" * (len(datasets) + 1)
    lines = [header, sep]
    for model in sorted(cells):
        row = [model]
        for ds in datasets:
            v = cells[model].get(ds)
            row.append(f"{v:.{digits}f}" if v is not None else "-")
        lines.append("| " + " | ".join(row) + " |")
    return "\n".join(lines)


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--metric_jsonl", required=True)
    ap.add_argument("--metric", default="cer_norm")
    arg = ap.parse_args(argv)
    print(pivot_table(load_metrics(arg.metric_jsonl), arg.metric))


if __name__ == "__main__":
    main()
