"""Committed eval goldens: the production eval driver must reproduce the
tiny-model artifacts in tests/goldens/eval_pipeline exactly, and the diff
tool (cli/eval_diff) must gate on them — the offline counterpart of the
reference's committed eval_pipeline artifacts
(run_short_form_eval.py:131-149,227-242; VERDICT r2 #6).
"""
import csv
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "tests", "goldens", "eval_pipeline")
sys.path.insert(0, REPO)

from tools import make_eval_goldens  # noqa: E402


@pytest.fixture(scope="module")
def fresh_run(tmp_path_factory):
    td = tmp_path_factory.mktemp("golden_rerun")
    ds = make_eval_goldens.make_dataset(str(td / "ds"))
    out = str(td / "eval_pipeline")
    make_eval_goldens.run_eval(ds, out)
    return out


def test_eval_reproduces_goldens(fresh_run):
    from kotoba_whisper_tpu.cli import eval_diff

    # strict diff (metrics within 1e-6, all predictions identical)
    eval_diff.main([
        "--ours", fresh_run,
        "--reference", GOLDEN_DIR,
        "--tolerance", "1e-6",
        "--strict",
    ])  # exits 1 on failure


def test_eval_diff_detects_regression(fresh_run, tmp_path):
    """Inject a prediction change + a metric drift; eval_diff must fail."""
    import shutil

    from kotoba_whisper_tpu.cli import eval_diff

    broken = tmp_path / "broken"
    shutil.copytree(fresh_run, broken)
    csvs = [f for f in os.listdir(broken) if f.startswith("model-")]
    path = broken / csvs[0]
    rows = list(csv.reader(open(path, encoding="utf-8")))
    rows[1][2] = rows[1][2] + "x"  # corrupt one normalized prediction
    with open(path, "w", newline="", encoding="utf-8") as f:
        csv.writer(f).writerows(rows)
    jl = broken / "metric.ja.transcribe.jsonl"
    rec = json.loads(open(jl).read().splitlines()[-1])
    rec["cer_norm"] += 5.0
    with open(jl, "w", encoding="utf-8") as f:
        f.write(json.dumps(rec) + "\n")

    with pytest.raises(SystemExit):
        eval_diff.main([
            "--ours", str(broken),
            "--reference", GOLDEN_DIR,
            "--tolerance", "1e-6",
            "--strict",
        ])


def test_reference_csv_schema(fresh_run):
    """The emitted CSV matches the reference's exact 5-column schema."""
    csvs = [f for f in os.listdir(fresh_run) if f.startswith("model-")]
    assert csvs, "no reference-schema CSV emitted"
    with open(os.path.join(fresh_run, csvs[0]), encoding="utf-8") as f:
        header = next(csv.reader(f))
    assert header == [
        "id", "reference_norm", "prediction_norm",
        "reference_raw", "prediction_raw",
    ]
