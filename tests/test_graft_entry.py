"""Driver entry points stay importable, jittable and correct on CPU.

The round driver compile-checks entry() single-chip and runs
dryrun_multichip(N) on a virtual CPU mesh; this test catches breakage
before the driver does.
"""

import numpy as np


def test_entry_compiles_and_runs():
    import jax

    import __graft_entry__

    fn, args = __graft_entry__.entry()
    (vals, nvs, nis, levels), ok = jax.jit(fn)(*args)
    assert np.asarray(ok).all()
    # inserting 8 distinct nonzero values must produce 8 occupied slots
    occupied = (np.asarray(vals).any(axis=0)).sum()
    assert occupied == 8


def test_dryrun_multichip_single_device():
    # n_devices=1 skips the virtual-mesh env juggling but still exercises
    # the sharded build + GSPMD insert step end-to-end.
    import __graft_entry__

    __graft_entry__.dryrun_multichip(1)
