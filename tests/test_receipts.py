"""RECEIPTS.md drift guard (VERDICT r6 ask #7): the committed ledger
must equal a fresh in-memory render at its own stamped input horizon.

The horizon stamp makes the guard precise about WHAT staleness is:
- re-running the gate sweep (a new CHECK_FULL_rN.json), landing a new
  driver receipt AND committing, or registering/renaming queries
  without regenerating RECEIPTS.md -> the re-render differs -> FAIL;
- a driver receipt that lands AFTER the final commit of a round (the
  normal end-of-round sequence) is beyond the stamped horizon and
  does not fail the suite — the NEXT round's regen picks it up, and
  the stamp itself going stale is caught below.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import receipts_report  # noqa: E402


def _committed() -> str:
    with open(os.path.join(REPO, "RECEIPTS.md")) as f:
        return f.read()


def test_receipts_md_matches_render_at_stamped_horizon():
    text = _committed()
    m = re.search(receipts_report.STAMP_RE, text)
    assert m, "RECEIPTS.md lacks the input-horizon stamp — regenerate it"
    receipt_round, gate_round = int(m.group(1)), int(m.group(2))
    fresh = receipts_report.render(receipt_round, gate_round)
    assert text == fresh, (
        "RECEIPTS.md is stale for its own stamped inputs — run "
        "`python tools/receipts_report.py`"
    )


def test_receipts_md_horizon_not_behind_available_gate():
    """The stamp must cover the newest BUILDER gate sweep present in
    the repo (CHECK_FULL files are builder-produced pre-commit, so a
    newer one than the stamp means regen was forgotten). The driver-
    receipt horizon is allowed to lag by exactly one round — the
    post-commit landing described in the module docstring."""
    text = _committed()
    m = re.search(receipts_report.STAMP_RE, text)
    assert m
    receipt_round, gate_round = int(m.group(1)), int(m.group(2))
    assert gate_round == receipts_report.newest_round(r"CHECK_FULL_r(\d+)\.json")
    newest_receipt = receipts_report.newest_round(r"CORRECTNESS_r(\d+)\.json")
    assert receipt_round >= newest_receipt - 1
