"""Torn-line repair in the JSONL manifest (ADVICE r4, medium).

A kill mid-append leaves a partial trailing line with no newline.  Before
the fix, open() skipped the torn line but left it in the file — the next
record() append concatenated onto it, forming another unparseable line, so
every record written after the torn point was invisible to every future
open() and that work re-ran forever.  open() must truncate the file back
to the last fully-committed record so appends land on a clean prefix.
"""

import json
import os

from aisdb_ray.state.lineage import Manifest


def _open(run_dir):
    return Manifest.open(str(run_dir), "fp-1")


def test_torn_tail_truncated_and_appends_survive(tmp_path):
    m = _open(tmp_path)
    m.record("stage_a", 0, rows=10)
    m.record("stage_a", 1, rows=20)
    # Simulate a kill mid-append: partial JSON, no trailing newline.
    with open(m.path, "a") as f:
        f.write('{"kind": "unit", "stage": "stage_a", "par')

    m2 = _open(tmp_path)
    assert m2.done("stage_a", 0) and m2.done("stage_a", 1)
    assert not m2.done("stage_a", 2)
    # The torn suffix must be gone — the file ends on a newline.
    with open(m2.path, "rb") as f:
        data = f.read()
    assert data.endswith(b"\n")

    # Records appended AFTER the repair must be visible on later opens
    # (this is the forever-re-run bug: pre-fix they concatenated onto the
    # torn line and were discarded by every subsequent open()).
    m2.record("stage_a", 2, rows=30)
    m2.invalidate("stage_a", 0)
    m3 = _open(tmp_path)
    assert m3.done("stage_a", 2)
    assert not m3.done("stage_a", 0)  # tombstone survived
    assert m3.done("stage_a", 1)


def test_torn_line_containing_newline_bytes(tmp_path):
    """A torn append whose partial payload still parses line-by-line as
    garbage (decode error mid-file tail) is also truncated away."""
    m = _open(tmp_path)
    m.record("s", "p0", rows=1)
    with open(m.path, "a") as f:
        f.write('{"kind": "unit", "stage"\n')  # newline-terminated garbage
    m2 = _open(tmp_path)
    assert m2.done("s", "p0")
    m2.record("s", "p1", rows=2)
    m3 = _open(tmp_path)
    assert m3.done("s", "p1")


def test_torn_header_rewrites_header(tmp_path):
    """If even the header line is torn, the repaired (empty) file gets a
    fresh header so fingerprint staleness detection keeps working."""
    run = tmp_path / "r"
    run.mkdir()
    mpath = run / "manifest.jsonl"
    with open(mpath, "w") as f:
        f.write('{"kind": "header", "finger')  # torn, no newline
    m = Manifest.open(str(run), "fp-1")
    m.record("s", 0, rows=1)
    with open(mpath) as f:
        first = json.loads(f.readline())
    assert first["kind"] == "header" and first["fingerprint"] == "fp-1"
    # And a different fingerprint now invalidates as usual.
    m2 = Manifest.open(str(run), "fp-2")
    assert not m2.done("s", 0)


def test_clean_file_untouched(tmp_path):
    m = _open(tmp_path)
    m.record("s", 0, rows=1)
    size = os.path.getsize(m.path)
    m2 = _open(tmp_path)
    assert os.path.getsize(m2.path) == size
    assert m2.done("s", 0)
