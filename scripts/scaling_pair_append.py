"""Collect ONE scaling pair (cold or steady-state) and append it to
BENCH/scaling_pairs_r04.json with load-average stamps.

The sandbox box carries variable EXTERNAL load (r3: T1 swung 262-302 s
for an identical binary; r4 start: 303->410 s within an hour). Single
pairs are therefore meaningless without a load record, and the honest
round number is the minima/best across pairs collected in quiet windows
— this runner stamps `loadavg_before`/`loadavg_after` (1-min) on every
pair so contaminated windows are identifiable, and refuses to start when
the box is already busy (override with --force).

Usage: python scripts/scaling_pair_append.py [--steady-state] [--force]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scaling_run import generate_input, run_once  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = f"{REPO}/BENCH/scaling_pairs_r04.json"


def main() -> int:
    steady = "--steady-state" in sys.argv[1:]
    force = "--force" in sys.argv[1:]
    load1, load5, _ = os.getloadavg()
    if (load1 > 0.5 or load5 > 1.0) and not force:
        # r5-c5 lesson: a quiet 1-min average with a busy 5-min average
        # means the burst pattern is merely between pulses
        print(
            f"box busy (load1={load1:.2f}, load5={load5:.2f}) — refusing; "
            "--force to override"
        )
        return 2

    img, req = generate_input(12_000_000)
    r_low = run_once(1, img, req, steady=steady)
    mid_load = os.getloadavg()[0]
    r_high = run_once(4, img, req, steady=steady)
    after = os.getloadavg()[0]
    eff = (r_low["seconds"] / r_high["seconds"]) / 4.0
    pair = {
        "protocol": "steady" if steady else "cold",
        "low": r_low,
        "high": r_high,
        "speedup": round(r_low["seconds"] / r_high["seconds"], 3),
        "scaling_efficiency": round(eff, 3),
        "loadavg_before": round(load1, 2),
        "loadavg_mid": round(mid_load, 2),
        "loadavg_after": round(after, 2),
    }
    data = {"pairs": []}
    if os.path.exists(OUT):
        data = json.load(open(OUT))
    data["pairs"].append(pair)
    with open(OUT, "w") as fh:
        json.dump(data, fh, indent=2)
    print(json.dumps(pair))
    return 0


if __name__ == "__main__":
    sys.exit(main())
