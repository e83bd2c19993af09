"""Unit tests for the cheap, pure parts of tools/preflight.py.

The subprocess gates (pytest/sweep/rehearse/bench) are exercised by running
the tool itself each round; recursing into them from pytest would be
circular, so only the scanner and selection logic are pinned here.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import preflight  # noqa: E402

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "preflight.py")


def test_leak_gate_clean_dir(tmp_path):
    (tmp_path / "ok.py").write_text("x = 1  # plain public code\n")
    ok, detail = preflight.gate_leaks(roots=["."], repo=str(tmp_path))
    assert ok and detail == "0 hits"


def test_leak_gate_flags_planted_tokens(tmp_path):
    # tokens assembled at runtime so THIS file stays clean under the scan
    url = "s3" + "://bucket/x"
    key = "api" + "_key"
    (tmp_path / "bad.py").write_text(f"URL = '{url}'\nKEY = '{key}'\n")
    ok, detail = preflight.gate_leaks(roots=["."], repo=str(tmp_path))
    assert not ok
    assert "bad.py:1" in detail and "bad.py:2" in detail


def test_leak_gate_skips_pycache_and_non_source(tmp_path):
    cache = tmp_path / "__pycache__"
    cache.mkdir()
    leak = "s3" + "://leak"
    (cache / "bad.py").write_text(leak + "\n")
    (tmp_path / "data.bin").write_text(leak + "\n")
    ok, detail = preflight.gate_leaks(roots=["."], repo=str(tmp_path))
    assert ok, detail


def test_capability_gate_never_fails():
    ok, detail = preflight.gate_capabilities()
    assert ok
    assert "absent:" in detail


def test_cli_rejects_unknown_gate_name():
    proc = subprocess.run(
        [sys.executable, TOOL, "--only", "nonsense"],
        capture_output=True, text=True)
    assert proc.returncode != 0
    assert "unknown gate" in proc.stderr


def test_cli_runs_selected_cheap_gates_green():
    proc = subprocess.run(
        [sys.executable, TOOL, "--only", "leaks,gates"],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "2/2 gates green" in proc.stdout


def test_leak_gate_ignores_prose_word_internal(tmp_path):
    # ADVICE r9: a sentence ending in "internal." is prose, not a hostname
    (tmp_path / "doc.md").write_text("This knob is strictly internal.\n")
    ok, detail = preflight.gate_leaks(roots=["."], repo=str(tmp_path))
    assert ok, detail


def test_leak_gate_still_flags_internal_hostnames(tmp_path):
    host = "internal" + ".example-corp"  # assembled so THIS file stays clean
    (tmp_path / "cfg.py").write_text(f"HOST = '{host}.com'\n")
    ok, detail = preflight.gate_leaks(roots=["."], repo=str(tmp_path))
    assert not ok and "cfg.py:1" in detail
