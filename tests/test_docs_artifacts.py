"""The artifact rule: every hardware number quoted in the docs must trace
to a committed file.

Two /tmp recycles (rounds 3 and 4) destroyed completed hardware-queue
results that ARCHITECTURE.md was already quoting — prose said "committed as
docs/results/..." while no such file existed (VERDICT r4 weak #2 / next #7).
This fast-tier test makes that drift a test failure: any ``docs/results/``
path referenced anywhere in the repo's markdown must exist in the tree, and
every committed queue artifact must be well-formed.
"""

import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = [
    os.path.join(REPO, "README.md"),
    os.path.join(REPO, "BASELINE.md"),
    os.path.join(REPO, "docs", "ARCHITECTURE.md"),
]

REF_RE = re.compile(r"docs/results/[\w.\-]+\.json")


def _referenced_paths():
    refs = set()
    for doc in DOCS:
        if not os.path.exists(doc):
            continue
        with open(doc) as f:
            refs.update(REF_RE.findall(f.read()))
    return sorted(refs)


def test_every_referenced_results_artifact_exists():
    refs = _referenced_paths()
    assert refs, "docs quote hardware numbers; expected docs/results refs"
    missing = [r for r in refs if not os.path.exists(os.path.join(REPO, r))]
    assert not missing, (
        f"docs reference results artifacts that are not in the tree: "
        f"{missing} — run scripts/hwq_ingest.py on the queue logdir and "
        f"commit, or fix the prose")


def test_committed_queue_artifacts_are_well_formed():
    paths = glob.glob(os.path.join(REPO, "docs", "results", "hwq_*.json"))
    if not paths:
        pytest.skip("no queue artifacts committed yet")
    for path in paths:
        with open(path) as f:
            artifact = json.load(f)
        assert set(artifact) >= {"queue", "jobs"}, path
        for job, st in artifact["jobs"].items():
            assert "state" in st, (path, job)
