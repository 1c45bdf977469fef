"""Replay the external driver's bench capture on a bench.py run.

The driver records only the LAST ``TAIL_CHARS`` characters of bench.py's
stdout and json-parses the final line (observed empirically: r4's
``BENCH_r04.json`` stored a 2000-char ``tail`` and ``"parsed": null``
after the single output line outgrew the window). This script runs
``bench.py`` (or reads a captured stdout file), applies the SAME
truncation, and fails loudly if the final line inside the window does
not parse or lacks the contract keys — catching the r4 class of
regression before the driver does.

Usage:
    python scripts/bench_check.py                # run bench.py, check
    python scripts/bench_check.py --stdout FILE  # check a captured run
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

TAIL_CHARS = 2000
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REQUIRED_KEYS = {"metric", "value", "unit", "queries", "sf"}


def check_stdout(text: str) -> dict:
    """Apply the driver's tail window and parse the final line.

    Returns the parsed summary dict; raises SystemExit with a diagnostic
    on any failure mode the driver would also hit.
    """
    tail = text[-TAIL_CHARS:]
    lines = [ln for ln in tail.splitlines() if ln.strip()]
    if not lines:
        raise SystemExit("bench stdout tail is empty — nothing to parse")
    last = lines[-1]
    try:
        parsed = json.loads(last)
    except json.JSONDecodeError as exc:
        raise SystemExit(
            f"final line in the {TAIL_CHARS}-char tail does not parse "
            f"({exc}); line head: {last[:200]!r}"
        )
    missing = REQUIRED_KEYS - set(parsed)
    if missing:
        raise SystemExit(f"summary line missing contract keys: {missing}")
    # the line must ALSO fit the window in full, or a driver whose tail
    # boundary lands mid-line truncates its head
    if len(last) + 1 > TAIL_CHARS:
        raise SystemExit(
            f"summary line is {len(last)} chars (> {TAIL_CHARS} window)"
        )
    return parsed


def main() -> int:
    args = sys.argv[1:]
    if "--stdout" in args:
        path = args[args.index("--stdout") + 1]
        text = open(path).read()
    else:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-2000:])
            raise SystemExit(f"bench.py exited {proc.returncode}")
        text = proc.stdout
    parsed = check_stdout(text)
    print(
        json.dumps(
            {
                "bench_check": "ok",
                "value": parsed["value"],
                "n_queries": parsed.get("n_queries", len(parsed["queries"])),
                "line_chars": len(
                    json.dumps(parsed, separators=(",", ":"))
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
