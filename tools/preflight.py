"""One-command runner for every end-of-round gate.

Rounds 5-9 re-ran the same gate sequence by hand after each code change:
pytest, the full-registry oracle sweep, the bare driver-window rehearsal,
bench steady-state, a leak grep, and the capability-gate probe.  This tool
runs them in order, times each, and prints one PASS/FAIL table so a round's
"gates green on final code" claim is a single reproducible command.

Usage:
    python tools/preflight.py                 # every gate, sf0.01 sweep
    python tools/preflight.py --skip bench    # all but bench
    python tools/preflight.py --only leaks,gates   # just the cheap scans
    python tools/preflight.py --sweep-sf /root/testdata/sf0.1
    python tools/preflight.py --rehearse-sf /data/sf0.01   # non-default host

Gates (names for --only / --skip):
    pytest    python -m pytest tests/ -q
    sweep     tools/verify_local.py <sweep-sf>          (full registry)
    rehearse  tools/verify_local.py --bare --first 50 sf0.01
    bench     python bench.py  (sf from $SPARK_GRAFT_SF_DIR, default sf0.1)
    leaks     grep for non-public tokens over package/tools/bench/entry
    gates     capability probes (PIL/protobuf/fastavro/ffmpeg/spark-avro/
              network) — informational: records which are absent, never fails

Exit code: number of failed gates (0 = all green).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GATE_ORDER = ["pytest", "sweep", "rehearse", "bench", "leaks", "gates"]

# Tokens that must never appear in shipped source.  Mirrors the driver's
# LEAKCHECK categories; class names of public JDBC drivers are allowed.
LEAK_PATTERNS = [
    r"anthropic",
    r"claude",
    r"s3://",
    r"gs://",
    r"api[_-]?key",
    r"hooks\.slack\.com",
    # hostname-shaped only: a prose sentence ending in the word "internal."
    # is not a leak (ADVICE r9) — require a domain label after the dot
    r"\binternal\.[a-z0-9-]+",
]
LEAK_ROOTS = ["etl_ecommerce_data_spark", "tools", "tests", "bench.py",
              "__spark_entry__.py"]


def _run(cmd: list[str], log_name: str) -> tuple[bool, float, str]:
    """Run cmd from the repo root, tee output to /tmp/<log_name>.log."""
    log = os.path.join("/tmp", log_name + ".log")
    t0 = time.time()
    with open(log, "w") as fh:
        rc = subprocess.call(cmd, cwd=REPO, stdout=fh, stderr=subprocess.STDOUT)
    return rc == 0, time.time() - t0, log


def gate_pytest() -> tuple[bool, str]:
    ok, dt, log = _run([sys.executable, "-m", "pytest", "tests/", "-q"],
                       "preflight_pytest")
    tail = _tail_line(log, r"\d+ passed")
    return ok, f"{tail or 'see log'} ({dt:.0f}s, {log})"


def gate_sweep(sf_dir: str) -> tuple[bool, str]:
    ok, dt, log = _run([sys.executable, "tools/verify_local.py", sf_dir],
                       "preflight_sweep")
    tail = _tail_line(log, r"(queries match|FAILURES)")
    return ok, f"{tail or 'see log'} ({dt:.0f}s, {log})"


def _window_size() -> int:
    """The driver-window size, derived from the registry itself — a
    hardcoded 50 here would silently under-rehearse if _SWEEP_FIRST ever
    grows (three uncoordinated 50s: this gate, window_planner.WINDOW, and
    the list length)."""
    sys.path.insert(0, REPO)
    from etl_ecommerce_data_spark.plans.queries import _SWEEP_FIRST

    return len(_SWEEP_FIRST)


def gate_rehearse(sf_dir: str = "/root/testdata/sf0.01") -> tuple[bool, str]:
    ok, dt, log = _run(
        [sys.executable, "tools/verify_local.py", "--bare", "--first",
         str(_window_size()), sf_dir],
        "preflight_rehearse")
    tail = _tail_line(log, r"(queries match|FAILURES)")
    return ok, f"{tail or 'see log'} ({dt:.0f}s, {log})"


def gate_bench() -> tuple[bool, str]:
    ok, dt, log = _run([sys.executable, "bench.py"], "preflight_bench")
    # bench prints ONE json line; surface the headline metric — and surface
    # a PARSE failure instead of swallowing it (ADVICE r9: a green-but-
    # unparseable bench line must be visible in the summary table)
    detail = "no metric line found in log"
    try:
        with open(log) as fh:
            for line in fh:
                line = line.strip()
                if line.startswith("{") and '"metric"' in line:
                    j = json.loads(line)
                    detail = f"{j.get('value')} {j.get('unit')} / {len(j.get('queries', {}))} queries"
    except Exception as exc:  # malformed JSON / unreadable log
        detail = f"METRIC PARSE FAILED: {type(exc).__name__}: {exc}"
    return ok, f"{detail} ({dt:.0f}s, {log})"


def gate_leaks(roots: list[str] | None = None, repo: str = REPO) -> tuple[bool, str]:
    pat = re.compile("|".join(LEAK_PATTERNS), re.IGNORECASE)
    hits: list[str] = []
    missing: list[str] = []
    for root in (roots if roots is not None else LEAK_ROOTS):
        path = os.path.join(repo, root)
        if not os.path.exists(path):
            # a guard gate must fail CLOSED: a renamed/moved root silently
            # skipped would keep this gate green with zero coverage of it
            missing.append(root)
            continue
        files = []
        if os.path.isfile(path):
            files = [path]
        else:
            for dirpath, dirnames, filenames in os.walk(path):
                dirnames[:] = [d for d in dirnames if d != "__pycache__"]
                files.extend(os.path.join(dirpath, f) for f in filenames
                             if f.endswith((".py", ".md", ".json", ".sql")))
        for f in files:
            if os.path.abspath(f) == os.path.abspath(__file__):
                continue  # the pattern list itself would self-match
            try:
                with open(f, errors="replace") as fh:
                    for i, line in enumerate(fh, 1):
                        if pat.search(line):
                            hits.append(f"{os.path.relpath(f, repo)}:{i}")
            except OSError:
                pass
    if missing:
        return False, f"scan roots missing (gate fails closed): {missing}"
    return not hits, ("0 hits" if not hits else f"{len(hits)} hits: " + ", ".join(hits[:5]))


def gate_capabilities() -> tuple[bool, str]:
    absent = []
    for mod in ["PIL", "google.protobuf", "fastavro", "avro"]:
        try:
            __import__(mod)
        except ImportError:
            absent.append(mod)
    if shutil.which("ffmpeg") is None:
        absent.append("ffmpeg")
    try:
        socket.create_connection(("repo1.maven.org", 443), timeout=2).close()
        net = "network UP (re-check spark-avro gate!)"
    except OSError:
        net = "network absent"
        absent.append("network")
    # informational: absence is the documented sandbox state, never a failure
    return True, f"absent: {', '.join(absent) or 'none'}; {net}"


def _tail_line(log: str, pattern: str) -> str:
    """Last log line matching pattern (for the summary table)."""
    try:
        with open(log, errors="replace") as fh:
            lines = [ln.strip() for ln in fh if re.search(pattern, ln)]
        return lines[-1] if lines else ""
    except OSError:
        return ""


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--only", help="comma-separated gate names to run")
    ap.add_argument("--skip", help="comma-separated gate names to skip")
    ap.add_argument("--sweep-sf", default="/root/testdata/sf0.01",
                    help="sf dir for the full-registry sweep")
    ap.add_argument("--rehearse-sf", default=None,
                    help="sf dir for the bare driver-window rehearsal "
                         "(defaults to sf0.01 next to --sweep-sf's parent, "
                         "falling back to --sweep-sf itself)")
    args = ap.parse_args()

    # ADVICE r9: don't hard-code /root/testdata/sf0.01 — derive the
    # rehearsal dir from --sweep-sf's layout so the runner works on hosts
    # with testdata elsewhere. A RELATIVE --sweep-sf resolves against the
    # repo (where the gate subprocesses run), not the invoker's cwd — the
    # two resolutions disagreeing would silently rehearse at the wrong SF.
    sweep_abs = (args.sweep_sf if os.path.isabs(args.sweep_sf)
                 else os.path.join(REPO, args.sweep_sf))
    if args.rehearse_sf is None:
        sibling = os.path.join(os.path.dirname(sweep_abs.rstrip("/")), "sf0.01")
        args.rehearse_sf = sibling if os.path.isdir(sibling) else sweep_abs

    def parse_gates(raw: str, flag: str) -> set[str]:
        names = {g.strip() for g in raw.split(",") if g.strip()}
        unknown = names - set(GATE_ORDER)
        if unknown:
            ap.error(f"unknown gate(s) in {flag}: {sorted(unknown)}")
        return names

    selected = list(GATE_ORDER)
    if args.only:
        selected = [g for g in selected if g in parse_gates(args.only, "--only")]
    if args.skip:
        dropped = parse_gates(args.skip, "--skip")
        selected = [g for g in selected if g not in dropped]
    if not selected:
        # "0/0 gates green, exit 0" would record success off a run that
        # verified nothing
        ap.error("the --only/--skip combination selects no gates")

    runners = {
        "pytest": gate_pytest,
        "sweep": lambda: gate_sweep(sweep_abs),
        "rehearse": lambda: gate_rehearse(args.rehearse_sf),
        "bench": gate_bench,
        "leaks": gate_leaks,
        "gates": gate_capabilities,
    }

    results: list[tuple[str, bool, str]] = []
    for name in selected:
        print(f"== {name} ...", flush=True)
        t0 = time.time()
        ok, detail = runners[name]()
        print(f"   {'PASS' if ok else 'FAIL'} in {time.time() - t0:.0f}s — {detail}",
              flush=True)
        results.append((name, ok, detail))

    print("\n== preflight summary ==")
    failed = 0
    for name, ok, detail in results:
        print(f"  {'PASS' if ok else 'FAIL':4}  {name:9} {detail}")
        failed += 0 if ok else 1
    print(f"{len(results) - failed}/{len(results)} gates green")
    return failed


if __name__ == "__main__":
    sys.exit(main())
