"""Brute-force search over Poseidon spec variants to match the reference anchor.

The reference pins Poseidon(0,0,0) =
1960587138944869480785025106734196872454309951825657414575195034687326603497
(src/indexed_merkle_tree.rs:247-251). The exact constant-generation and sponge
conventions live in its (unvendored) pse-poseidon dependency, so we search the
small space of plausible conventions until the anchor reproduces, then lock the
winning variant into imt_tpu/ops/{grain,poseidon_ref}.py.
"""

import itertools
import sys

# imt_tpu is an installed package (pip install -e . — pyproject.toml)

from imt_tpu.ops.grain import P, Grain, generate_mds, generate_round_constants

ANCHOR = 1960587138944869480785025106734196872454309951825657414575195034687326603497

T, RATE, R_F, R_P = 3, 2, 8, 57


def permute(state, rc, mds, partial_word, rc_order):
    t = len(state)
    half = R_F // 2
    n_rounds = R_F + R_P
    for r in range(n_rounds):
        c = rc[r]
        st = [(state[i] + c[i]) % P for i in range(t)]
        if half <= r < half + R_P:
            st[partial_word] = pow(st[partial_word], 5, P)
        else:
            st = [pow(x, 5, P) for x in st]
        state = [sum(mds[i][j] * st[j] for j in range(t)) % P for i in range(t)]
    return state


def hash3_zero(rc, mds, init64, out_idx, absorb_base, partial_word, rc_order):
    # sponge: update([0,0,0]) then squeeze_and_reset
    state = [0] * T
    state[0 if absorb_base == 1 else T - 1] = (1 << 64) % P if init64 else 0
    # chunk 1: [0,0] -> add at state[absorb_base..]
    state = permute(state, rc, mds, partial_word, rc_order)
    # chunk 2: [0, 1]
    state[absorb_base + 1] = (state[absorb_base + 1] + 1) % P
    state = permute(state, rc, mds, partial_word, rc_order)
    return state[out_idx]


def main():
    rc_modes = ["nonrej_lsb", "nonrej_msb", "rej_msb"]
    n_bits_opts = [254, 255]
    hits = []
    for rc_mode, n_bits in itertools.product(rc_modes, n_bits_opts):
        try:
            grain = Grain(T, R_F, R_P, n_bits=n_bits)
            rc = generate_round_constants(grain, T, R_F + R_P, mode=rc_mode)
            mds = generate_mds(grain, T)
        except Exception as e:  # noqa: BLE001
            print(f"genfail {rc_mode} {n_bits}: {e}")
            continue
        mds_t = [[mds[j][i] for j in range(T)] for i in range(T)]
        for use_t, init64, out_idx, absorb_base, partial_word in itertools.product(
            [False, True], [True, False], [1, 0, 2], [1, 0], [0, T - 1]
        ):
            m = mds_t if use_t else mds
            h = hash3_zero(rc, m, init64, out_idx, absorb_base, partial_word, "row")
            if h == ANCHOR:
                hits.append((rc_mode, n_bits, use_t, init64, out_idx, absorb_base, partial_word))
                print("HIT:", hits[-1])
    if not hits:
        print("NO HIT in primary space")
    return hits


if __name__ == "__main__":
    main()
