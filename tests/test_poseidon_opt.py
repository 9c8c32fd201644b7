"""Optimized-spec partial rounds (ops/poseidon_opt.py): the derived sparse
structure and the kernel's lazy-column schedule must both reproduce the
standard permutation bit-for-bit."""

import random

from imt_tpu.ops.grain import P
from imt_tpu.ops.poseidon_opt import (optimize_params, permute_opt,
                                      permute_opt_lazy)
from imt_tpu.ops.poseidon_ref import generate_params, permute


def test_opt_equals_standard():
    params = generate_params()
    opt = optimize_params(params)
    rng = random.Random(0x0B7)
    for trial in range(25):
        st = [rng.randrange(P) for _ in range(3)]
        assert permute_opt(st, opt) == permute(list(st), params), trial
    assert permute_opt([0, 0, 0], opt) == permute([0, 0, 0], params)


def test_opt_lazy_schedule_equals_standard():
    params = generate_params()
    opt = optimize_params(params)
    rng = random.Random(0x1A2)
    for g in (1, 2, 4, 6, 8, 19, 57):
        for trial in range(5):
            st = [rng.randrange(P) for _ in range(3)]
            assert permute_opt_lazy(st, opt, g) == permute(list(st), params), \
                (g, trial)
