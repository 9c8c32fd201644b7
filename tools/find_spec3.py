"""Search round 3: vary grain seed tags, output-bit conventions, discard
counts, round schedule, MDS sampling interleave, plus circomlib-style blake2b
constants as an alternative family."""

import itertools
import sys
import time

P = 21888242871839275222246405745257275088548364400416034343698204186575808495617
ANCHOR = 1960587138944869480785025106734196872454309951825657414575195034687326603497
T, RATE, R_F, R_P = 3, 2, 8, 57


class G:
    def __init__(self, t, r_f, r_p, n_bits, field_tag, sbox_tag, discard,
                 out_mode, pair_after_discard_pairs):
        bits = []

        def put(value, width):
            for i in reversed(range(width)):
                bits.append((value >> i) & 1)

        put(field_tag, 2)
        put(sbox_tag, 4)
        put(n_bits, 12)
        put(t, 12)
        put(r_f, 10)
        put(r_p, 10)
        bits.extend([1] * 30)
        self.state = bits
        self.out_mode = out_mode  # "new" = feedback bit, "old" = shifted-out bit
        if pair_after_discard_pairs:
            for _ in range(discard):
                self.bit()
        else:
            for _ in range(discard):
                self._raw()

    def _raw(self):
        s = self.state
        nb = s[62] ^ s[51] ^ s[38] ^ s[23] ^ s[13] ^ s[0]
        old = s.pop(0)
        s.append(nb)
        return nb if self.out_mode == "new" else old

    def bit(self):
        while True:
            b1 = self._raw()
            b2 = self._raw()
            if b1:
                return b2

    def int_msb(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def int_lsb(self, n):
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v

    def fe_rej(self, n, order):
        while True:
            v = self.int_msb(n) if order == "msb" else self.int_lsb(n)
            if v < P:
                return v

    def fe_nonrej(self, n, order):
        v = self.int_msb(n) if order == "msb" else self.int_lsb(n)
        return v % P


def gen(cfg):
    (field_tag, sbox_tag, n_seed, discard, out_mode, pair_disc,
     rc_mode, rc_order, mds_interleave, mds_order) = cfg
    g = G(T, R_F, R_P, n_seed, field_tag, sbox_tag, discard, out_mode, pair_disc)
    rc = []
    for _ in range(R_F + R_P):
        row = []
        for _ in range(T):
            if rc_mode == "rej":
                row.append(g.fe_rej(n_seed, rc_order))
            else:
                row.append(g.fe_nonrej(n_seed, rc_order))
        rc.append(row)
    if mds_interleave:
        xy = [g.fe_rej(n_seed, mds_order) for _ in range(2 * T)]
        xs, ys = xy[0::2], xy[1::2]
    else:
        xs = [g.fe_rej(n_seed, mds_order) for _ in range(T)]
        ys = [g.fe_rej(n_seed, mds_order) for _ in range(T)]
    mds = [[pow((x + y) % P, P - 2, P) for y in ys] for x in xs]
    return rc, mds


def permute_a(state, rc, mds, pw):
    half = R_F // 2
    for r in range(R_F + R_P):
        c = rc[r]
        st = [(state[i] + c[i]) % P for i in range(T)]
        if half <= r < half + R_P:
            st[pw] = pow(st[pw], 5, P)
        else:
            st = [pow(x, 5, P) for x in st]
        state = [(mds[i][0] * st[0] + mds[i][1] * st[1] + mds[i][2] * st[2]) % P
                 for i in range(T)]
    return state


def permute_b(state, rc, mds, pw):
    """Schedule B: pre-add rc[0]; rounds use rc[r+1] after the sbox; the last
    round has no constant."""
    half = R_F // 2
    state = [(state[i] + rc[0][i]) % P for i in range(T)]
    for r in range(R_F + R_P):
        st = list(state)
        if half <= r < half + R_P:
            st[pw] = pow(st[pw], 5, P)
        else:
            st = [pow(x, 5, P) for x in st]
        if r + 1 < R_F + R_P:
            st = [(st[i] + rc[r + 1][i]) % P for i in range(T)]
        state = [(mds[i][0] * st[0] + mds[i][1] * st[1] + mds[i][2] * st[2]) % P
                 for i in range(T)]
    return state


def hash3_zero(perm, rc, mds, pw):
    state = [(1 << 64) % P, 0, 0]
    state = perm(state, rc, mds, pw)
    state[2] = (state[2] + 1) % P
    state = perm(state, rc, mds, pw)
    return state[1]


def main():
    tags = [(1, 0), (0, 0), (1, 1), (0, 1), (2, 0), (3, 0)]
    cfgs = []
    for (ft, st), n_seed, discard, out_mode, pair_disc in itertools.product(
            tags, [254, 255], [160, 80], ["new", "old"], [False, True]):
        for rc_mode, rc_order in [("nonrej", "lsb"), ("nonrej", "msb"),
                                  ("rej", "msb"), ("rej", "lsb")]:
            for mds_interleave in [False, True]:
                for mds_order in ["msb", "lsb"]:
                    cfgs.append((ft, st, n_seed, discard, out_mode, pair_disc,
                                 rc_mode, rc_order, mds_interleave, mds_order))
    print(len(cfgs), "configs", flush=True)
    t0 = time.time()
    for i, cfg in enumerate(cfgs):
        try:
            rc, mds = gen(cfg)
        except Exception:
            continue
        mds_t = [[mds[j][i] for j in range(T)] for i in range(T)]
        for perm in (permute_a, permute_b):
            for m in (mds, mds_t):
                for pw in (0, 2):
                    if hash3_zero(perm, rc, m, pw) == ANCHOR:
                        print("HIT:", cfg, perm.__name__, m is mds_t, pw, flush=True)
                        return
        if i % 100 == 99:
            print(f"  {i+1}/{len(cfgs)} {time.time()-t0:.0f}s", flush=True)
    print("NO HIT")


if __name__ == "__main__":
    main()
