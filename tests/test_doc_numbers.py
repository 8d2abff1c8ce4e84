"""Doc-number hygiene (VERDICT r4 #6, third recurrence of the finding):
BASELINE.md's canonical banner must agree with the committed BENCH_ALL.json
— the sha it names and the primary steps/s it states. The banner is the one
line allowed to restate the blob; everything else in the round sections
either matches it or is marked superseded. This test makes the drift class
unrepresentable: re-capture the blob → update the banner → test passes.
"""

import json
import os
import re

import pytest

pytestmark = pytest.mark.fast

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(name):
    with open(os.path.join(_ROOT, name)) as f:
        return f.read()


def test_baseline_banner_matches_committed_blob():
    blob = json.loads(_read("BENCH_ALL.json"))
    text = _read("BASELINE.md")
    m = re.search(
        r"Canonical = `BENCH_ALL\.json @ ([0-9a-f]{7,})`[^,]*,\s*primary\s*"
        r"([0-9.]+)\s*steps/s",
        text,
    )
    assert m, "BASELINE.md is missing the canonical-blob banner"
    sha, value = m.group(1), float(m.group(2))
    assert sha == blob["git_sha"], (
        f"BASELINE.md banner names blob sha {sha}, committed blob is "
        f"{blob['git_sha']} — re-capture or fix the banner"
    )
    primary = blob["rows"][blob["primary"]]["value"]
    assert abs(value - primary) < 0.05 + 1e-9, (
        f"BASELINE.md banner states primary {value} steps/s, committed blob "
        f"says {primary}"
    )


def test_to_target_prose_matches_blob():
    """The to-target seconds stated in BASELINE.md prose must match the
    blob's to_target entry (the round-4 drift: 39.2 vs 49.4 s)."""
    blob = json.loads(_read("BENCH_ALL.json"))
    tt = blob.get("to_target")
    if not tt or tt.get("error") or "seconds_steady" not in tt:
        pytest.skip("blob has no successful to_target entry")
    text = _read("BASELINE.md")
    m = re.search(r"\*\*([0-9.]+) s steady-state\*\* \(([0-9.]+) s total", text)
    assert m, "BASELINE.md is missing the to-target prose"
    assert abs(float(m.group(1)) - tt["seconds_steady"]) < 0.05
    assert abs(float(m.group(2)) - tt["value"]) < 0.05
