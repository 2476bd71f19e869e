"""Dev-time AV1 oracle tooling: an EXACT constructive encoder for the
decoder's msac semantics (forward feasible-interval tracking, backward
bit extraction) used to steer single-symbol probe streams through the
SYSTEM libdav1d and pin every CDF table, context rule and scan order
empirically. See extract_av1_tables.py / Av1DecoderSpec.
"""

import struct, sys
sys.path.insert(0, 'tools')

def _pad_cfl(out):
    g,st,v = out['cfl_sign']
    if st == 8: out['cfl_sign'] = (1, 9, list(v)+[0])
    return out

def load():
    d = open('src/main/resources/graft/av1_tables.bin', 'rb').read()
    i = 0; out = {}
    while i < len(d):
        n = d[i]; i += 1
        name = d[i:i+n].decode(); i += n
        g, st = struct.unpack_from('<HH', d, i); i += 4
        vals = struct.unpack_from('<%dH' % (g*st), d, i); i += 2*g*st
        out[name] = (g, st, list(vals))
    return out
T = _pad_cfl(load())

class SteerM:
    """decoder over a mutable bit list; raw() returns chosen bits, and
    asks the chooser when bits are not yet decided."""
    def __init__(self, bits, nbytes):
        self.bits = bits  # list of 0/1, grown on demand
        self.nbytes = nbytes
        nb = min(nbytes*8, 15)
        buf = 0
        for i in range(nb): buf = (buf << 1) | self.bit(i)
        self.value = ((1 << 15) - 1) ^ (buf << (15 - nb))
        self.range = 1 << 15
        self.maxBits = 8*nbytes - 15
        self.extra = 0
    def bit(self, i):
        while len(self.bits) <= i: self.bits.append(0)
        return self.bits[i]
    def raw(self, n):
        v = 0
        for i in range(n):
            bi = 15 + self.extra + i
            b = self.bit(bi) if bi < 8*self.nbytes else 0
            v = (v << 1) | b
        self.extra += n
        return v
    def renorm(self):
        bits = 0; r = self.range
        while r < (1 << 15): r <<= 1; bits += 1
        if bits:
            self.range = r
            nb = min(bits, max(0, self.maxBits))
            nd = self.raw(nb) << (bits - nb)
            self.maxBits -= bits
            self.value = nd ^ (((self.value + 1) << bits) - 1)
    def sym(self, cdf, off, n):
        cur = self.range; s = -1
        while True:
            s += 1; prev = cur
            f = 0 if s == n - 1 else cdf[off + s]
            cur = ((self.range >> 8) * (f >> 6)) >> 1
            cur += 4 * (n - 1 - s)
            if self.value >= cur: break
        self.range = prev - cur; self.value -= cur
        self.renorm()
        cnt = cdf[off + n]
        rate = 4 + (cnt >> 4) + (1 if n > 3 else 0)
        for i in range(s): cdf[off + i] += (32768 - cdf[off + i]) >> rate
        for i in range(s, n - 1): cdf[off + i] -= cdf[off + i] >> rate
        cdf[off + n] = cnt + (1 if cnt < 32 else 0)
        return s
    def boolbit(self):
        cur = ((self.range >> 8) << 7) + 4
        if self.value < cur:
            self.range = cur; self.renorm(); return 1
        else:
            self.value -= cur; self.range -= cur; self.renorm(); return 0

def steer(target, nbytes=8, tries=400000):
    """target: list of (kind, args, want). kind: 'sym' (tablename, off, n)
    or 'bit'. Random restarts + greedy prefix keeping."""
    import random
    rnd = random.Random(7)
    best_bits = None; best_len = -1
    cur_bits = [rnd.randint(0, 1) for _ in range(8*nbytes)]
    for t in range(tries):
        tabs = {k: v[2][:] for k, v in T.items()}
        m = SteerM(cur_bits[:], nbytes)
        oklen = 0
        for (kind, args, want) in target:
            if kind == 'sym':
                name, off, n = args
                got = m.sym(tabs[name], off, n)
            else:
                got = m.boolbit()
            if got != want: break
            oklen += 1
        if oklen == len(target):
            return bytes(sum(cur_bits[8*i+j] << (7-j) for j in range(8)) for i in range(nbytes))
        if oklen > best_len:
            best_len = oklen; best_bits = cur_bits[:]
        else:
            cur_bits = best_bits[:]
        # mutate: mostly single bits, occasionally a burst, biased late
        for _ in range(1 + (t % 7 == 0) * 4):
            p = rnd.randint(0, 8*nbytes - 1)
            cur_bits[p] ^= 1
        if t % 997 == 0:  # periodic restart of the tail
            for p in range(rnd.randint(8, 8*nbytes - 1), 8*nbytes):
                cur_bits[p] = rnd.randint(0, 1)
    raise AssertionError(f'steer failed at prefix {best_len}/{len(target)}')

import av1_harness as H

def dav1d_on_tile(tile):
    head = bytes.fromhex('12000a0a000000019ff8fff000803206')
    frame_hdr = bytes.fromhex('10008000')
    payload = frame_hdr + tile
    # rebuild frame OBU with correct size
    obu = head[:-1] + bytes([len(payload)]) + payload
    w, h, layout, planes = H.dav1d_decode(obu)
    ys = sorted(set(planes[0])); us = sorted(set(planes[1])); vs = sorted(set(planes[2]))
    return ys, us, vs


def encode_target(target, nbytes, pins=None, record=None):
    """Exact encoder for MY decoder semantics: forward feasible-interval
    tracking (value is the complement window), backward bit extraction.
    target: list of ('sym', (table, off, n), want) tuples."""
    tabs = {k: v[2][:] for k, v in T.items()}
    rng = 1 << 15
    maxBits = 8 * nbytes - 15
    lo, hi = 0, (1 << 15) - 1
    steps = []  # (curS, d, numBits, lo_before_renorm...) for backprop
    for ti, (kind, args, want) in enumerate(target):
        if kind == 'bit':
            cur = ((rng >> 8) << 7) + 4
            if want == 1:
                nlo, nhi = lo, min(hi, cur - 1)
                rng2 = cur
            else:
                nlo, nhi = max(lo, cur), hi
                rng2 = rng - cur
            if nlo > nhi: raise AssertionError(f'infeasible bit at {ti}')
            lo2, hi2 = (nlo, nhi) if want == 1 else (nlo - cur, nhi - cur)
            d = 0; r = rng2
            while r < (1 << 15): r <<= 1; d += 1
            nb = min(d, max(0, maxBits)); maxBits -= d
            steps.append((0 if want == 1 else cur, d, nb))
            if d > 0:
                lo3 = ((lo2 + 1) << d) - 1 - ((1 << nb) - 1)
                hi3 = ((hi2 + 1) << d) - 1
            else:
                lo3, hi3 = lo2, hi2
            rng = r; lo, hi = lo3, hi3
            continue
        name, off, n = args
        cdf = tabs[name]
        # compute cur values with current range
        def curv(s):
            f = 0 if s == n - 1 else cdf[off + s]
            return (((rng >> 8) * (f >> 6)) >> 1) + 4 * (n - 1 - s)
        cur_s = curv(want)
        prev = rng if want == 0 else curv(want - 1)
        nlo = max(lo, cur_s)
        nhi = min(hi, prev - 1)
        if nlo > nhi:
            raise AssertionError(f'infeasible at {name} want={want} [{lo},{hi}] cur={cur_s} prev={prev}')
        if pins and pins != 'rand' and ti in pins:
            plo, phi = pins[ti]
            nlo = max(nlo, plo)
            nhi = min(nhi, phi)
            if nlo > nhi:
                raise AssertionError(f'pin infeasible at step {ti}')
        # value' = value - cur_s ; range' = prev - cur_s
        lo2, hi2 = nlo - cur_s, nhi - cur_s
        rng2 = prev - cur_s
        # renorm
        d = 0
        r = rng2
        while r < (1 << 15): r <<= 1; d += 1
        nb = min(d, max(0, maxBits))
        maxBits -= d
        steps.append((cur_s, d, nb))
        if d > 0:
            lo3 = ((lo2 + 1) << d) - 1 - ((1 << nb) - 1)
            hi3 = ((hi2 + 1) << d) - 1
        else:
            lo3, hi3 = lo2, hi2
        rng = r
        lo, hi = lo3, hi3
        # adapt
        cnt = cdf[off + n]
        rate = 4 + (cnt >> 4) + (1 if n > 3 else 0)
        for i in range(want): cdf[off + i] += (32768 - cdf[off + i]) >> rate
        for i in range(want, n - 1): cdf[off + i] -= cdf[off + i] >> rate
        cdf[off + n] = cnt + (1 if cnt < 32 else 0)
    # backward: pick final value (randomizable), recover choices
    import random as _r
    v = _r.randint(lo, hi) if pins == 'rand' else hi
    datas = []
    for (cur_s, d, nb) in reversed(steps):
        if d > 0:
            # v = ((v_prev+1)<<d)-1 - newData, newData in [0, 2^nb)
            base = None
            # choose newData so that v_prev integer: v_prev = ((v + newData + 1) >> d) - 1
            # need (v + newData + 1) divisible by 2^d
            rem = (-(v + 1)) % (1 << d)
            nd = rem
            assert nd < (1 << nb) or nb == 0, (nd, nb)
            if nb == 0: assert nd == 0, 'needs bits past buffer'
            v_prev = ((v + nd + 1) >> d) - 1
            datas.append((nd, nb))
            v = v_prev
        else:
            datas.append((0, 0))
        v = v + cur_s
    datas.reverse()
    # assemble bits: first 15 bits = complement of initial value v0 = v
    bits = []
    init = ((1 << 15) - 1) ^ v
    for i in range(15): bits.append((init >> (14 - i)) & 1)
    for nd, nb in datas:
        for i in range(nb): bits.append((nd >> (nb - 1 - i)) & 1)
    while len(bits) < 8 * nbytes: bits.append(0)
    by = bytes(sum(bits[8*i+j] << (7-j) for j in range(8)) for i in range(nbytes))
    # self-check with the decoder
    m = SteerM([(by[i>>3]>>(7-(i&7)))&1 for i in range(8*nbytes)], nbytes)
    tabs2 = {k: v[2][:] for k, v in T.items()}
    for ti2, (kind, args, want) in enumerate(target):
        if record is not None: record.append((m.value, m.range))
        if kind == 'bit':
            got = m.boolbit()
            assert got == want, ('bit', ti2, got, want)
        else:
            name, off, n = args
            got = m.sym(tabs2[name], off, n)
            assert got == want, (name, got, want)
    return by
