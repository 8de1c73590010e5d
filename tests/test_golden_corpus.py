"""End-to-end golden corpus: the 39 official RML CSV test cases.

Mirrors the reference's own corpus (`/root/reference/run_test.sh` +
`resources/csv-testcases/*/output.nq`) but actually *executes* each
mapping on Spark and diffs triples (the reference only checks that plan
generation succeeds; SURVEY.md §5).  BASELINE target: P/R ≥ 0.95.
"""

from __future__ import annotations

import glob
import os

import pytest

from kgloom.engine import nquads, run_rml_file
from kgloom.exec.binder import BindError
from kgloom.rml.extract import RmlValidationError

from golden import parse_nquads, precision_recall

CORPUS = "/root/reference/resources/csv-testcases"
CASES = sorted(os.path.basename(d) for d in glob.glob(f"{CORPUS}/RMLTC*"))

def run_case(spark, case: str):
    """Execute one case; compile/bind rejections (invalid mappings —
    RMLTC0002c/0002e/0007h/0012c/0012d/0015b) yield the empty set, which
    is exactly what their golden output is."""
    mapping = f"{CORPUS}/{case}/mapping.ttl"
    try:
        df = run_rml_file(spark, mapping, base_dir=f"{CORPUS}/{case}")
    except (RmlValidationError, BindError):
        return set()
    return set(parse_nquads("\n".join(nquads(df))))


def load_expected(case: str) -> set:
    path = f"{CORPUS}/{case}/output.nq"
    if not os.path.exists(path):
        return set()
    with open(path, encoding="utf-8") as f:
        return parse_nquads(f.read())


@pytest.mark.parametrize("case", CASES)
def test_golden_case(spark, case):
    actual = run_case(spark, case)
    expected = load_expected(case)
    assert actual == expected, (
        f"{case}: \n  missing: {sorted(expected - actual)[:5]}"
        f"\n  extra: {sorted(actual - expected)[:5]}")


def test_corpus_precision_recall(spark):
    """Aggregate P/R over the whole corpus — the BASELINE.json gate."""
    tps = acts = exps = 0
    for case in CASES:
        expected = load_expected(case)
        actual = run_case(spark, case)
        tps += len(actual & expected)
        acts += len(actual)
        exps += len(expected)
    precision = tps / acts if acts else 1.0
    recall = tps / exps if exps else 1.0
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
