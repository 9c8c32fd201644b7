"""Targeted: hadeshash-sage conventions — rc with rejection (MSB), MDS x/y
WITHOUT rejection (MSB, mod p). Plus sponge/schedule sub-variants."""

import itertools

P = 21888242871839275222246405745257275088548364400416034343698204186575808495617
ANCHOR = 1960587138944869480785025106734196872454309951825657414575195034687326603497
T, R_F, R_P = 3, 8, 57


class G:
    def __init__(self, n_bits=254):
        bits = []

        def put(v, w):
            for i in reversed(range(w)):
                bits.append((v >> i) & 1)

        put(1, 2); put(0, 4); put(n_bits, 12); put(T, 12); put(R_F, 10); put(R_P, 10)
        bits.extend([1] * 30)
        self.s = bits
        for _ in range(160):
            self._raw()

    def _raw(self):
        s = self.s
        nb = s[62] ^ s[51] ^ s[38] ^ s[23] ^ s[13] ^ s[0]
        s.pop(0); s.append(nb)
        return nb

    def bit(self):
        while True:
            if self._raw():
                return self._raw()
            self._raw()

    def int_msb(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def gen(n_bits, rc_rej, mds_rej):
    g = G(n_bits)
    rc = []
    for _ in range((R_F + R_P) * T):
        v = g.int_msb(n_bits)
        if rc_rej:
            while v >= P:
                v = g.int_msb(n_bits)
        else:
            v %= P
        rc.append(v)
    rc = [rc[i * T:(i + 1) * T] for i in range(R_F + R_P)]

    def mds_sample():
        v = g.int_msb(n_bits)
        if mds_rej:
            while v >= P:
                v = g.int_msb(n_bits)
        return v % P

    xs = [mds_sample() for _ in range(T)]
    ys = [mds_sample() for _ in range(T)]
    mds = [[pow((x + y) % P, P - 2, P) for y in ys] for x in xs]
    return rc, mds


def permute(state, rc, mds, pw):
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


def main():
    for n_bits, rc_rej, mds_rej in itertools.product([254, 255], [True, False], [False, True]):
        rc, mds = gen(n_bits, rc_rej, mds_rej)
        mds_t = [[mds[j][i] for j in range(T)] for i in range(T)]
        # official test vector check: perm of [0,1,2], first output word
        tv = permute([0, 1, 2], rc, mds, 0)
        print(f"n={n_bits} rc_rej={rc_rej} mds_rej={mds_rej} perm([0,1,2])[0] = {tv[0]:#066x}")
        for m, init64, out_idx, pw in itertools.product(
                (mds, mds_t), (True, False), (0, 1, 2), (0, 2)):
            state = [0] * T
            state[0] = (1 << 64) % P if init64 else 0
            state = permute(state, rc, m, pw)
            state[2] = (state[2] + 1) % P
            state = permute(state, rc, m, pw)
            if state[out_idx] == ANCHOR:
                print("HIT:", n_bits, rc_rej, mds_rej, m is mds_t, init64, out_idx, pw)
                return
    print("NO HIT")


main()
