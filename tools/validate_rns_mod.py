"""Exhaustive proof of the f32 floor-mod exactness claim in field_rns.py.

For every prime q in the RNS basis and EVERY integer x in [0, 2^24):
    r = x - q * floor(x * invq),   invq = nextafter(fl(1/q), 0)
must satisfy 0 <= r <= q + 2 (never negative; quasi-canonical bound q+2).

Run:  python tools/validate_rns_mod.py          (~1 minute, CPU numpy)
Exit code 0 = proven.  This underwrites the correction-free hot loop.
"""

import sys

import numpy as np

# imt_tpu is an installed package (pip install -e . — pyproject.toml)
from imt_tpu.ops.rns_spec import default_rns  # noqa: E402


def main() -> int:
    qs = [int(q) for q in default_rns().all_q()]
    worst = 0.0
    for q in qs:
        invq = np.nextafter(np.float32(1.0 / q), np.float32(0))
        for lo in range(0, 1 << 24, 1 << 22):
            x = (lo + np.arange(1 << 22)).astype(np.float32)
            r = x - np.float32(q) * np.floor(x * invq)
            if (r < 0).any() or (r > q + 2).any():
                print(f"FAIL q={q}: r outside [0, q+2]")
                return 1
            worst = max(worst, float(r.max()) - q)
    print(f"PROVEN: r in [0, q+2] for all {len(qs)} primes, all x < 2^24 "
          f"(max excess over q: {worst})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
