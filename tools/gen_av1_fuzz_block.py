"""Differential fuzz generator for the 4x4 lossless coefficient path:
random single-block 8x8 frames with full coefficient streams, golden
from dav1d, checked against the Scala decoder via Av1Debug."""
import os, random, struct, sys
sys.path.insert(0, '/tmp/av1x'); sys.path.insert(0, 'tools')
import steerlib as S
from steerlib import encode_target
import av1_harness as H

SEQ8 = bytes.fromhex('0000000117e3ffc002')

def obu8(tile):
    payload = bytes.fromhex('10008000') + tile
    return bytes([0x12, 0x00, 0x0a, len(SEQ8)]) + SEQ8 + bytes([0x32, len(payload)]) + payload

DIAG4 = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]  # av1 4x4 zigzag

def coef_targets(plane, levels, aboveCul, leftCul, aboveDc, leftDc, txSzCtx=0):
    """Mirror the Scala readCoeffs for a 4x4 block, tx class 2D.
    levels: dict pos->(level, negative). Returns (targets, culLevel, dcCat)."""
    t = []
    pt = 1 if plane else 0
    nz = [p for p in DIAG4 if p in levels]
    if not nz:
        return None, 0, 0
    eob = max(DIAG4.index(p) for p in nz) + 1
    # txb ctx mirrors Scala (single 8x8 luma block / 4x4 chroma)
    # eob_pt
    eobPt = 1 if eob == 1 else (2 if eob == 2 else (3 if eob <= 3 else (4 if eob <= 5 else 5 if eob <= 9 else 6)))
    # recompute exactly like scala: eob = eobPt<2 ? eobPt : (1<<(eobPt-2))+1 .. range
    def pt_of(e):
        if e == 1: return 1
        if e == 2: return 2
        k = 2
        while (1 << (k - 1)) < e: k += 1
        return k + 1 if False else k + 1
    # direct: find smallest ept with e in range
    for ept in range(1, 8):
        loE = ept if ept < 2 else (1 << (ept - 2)) + 1
        hiE = ept if ept < 2 else (1 << (ept - 1))
        if loE <= eob <= hiE: break
    t.append(('sym', ('eob_pt_16', (pt * 2 + 0) * 6, 5), ept - 1))
    if ept >= 3:
        base = (1 << (ept - 2)) + 1
        extra = eob - base
        hibit = (extra >> (ept - 3)) & 1
        t.append(('sym', ('eob_extra', ((txSzCtx * 2 + pt) * 9 + (ept - 3)) * 3, 2), hibit))
        for i in range(1, ept - 2):
            t.append(('bit', None, (extra >> (ept - 3 - i)) & 1))
    lvl = [0] * 16
    for c in range(eob - 1, -1, -1):
        pos = DIAG4[c]
        row, col = pos >> 2, pos & 3
        level, neg = levels.get(pos, (0, False))
        if c == eob - 1:
            ctx = 0 if c == 0 else (1 if c <= 2 else (2 if c <= 4 else 3))
            want = min(level, 3) - 1
            t.append(('sym', ('coeff_base_eob', ((txSzCtx * 2 + pt) * 4 + ctx) * 4, 3), want))
        else:
            mag = 0
            for (dr, dc) in ((0, 1), (1, 0), (1, 1), (0, 2), (2, 0)):
                r2, c2 = row + dr, col + dc
                if r2 < 4 and c2 < 4: mag += min(lvl[r2 * 4 + c2], 3)
            ctx = min((mag + 1) >> 1, 4)
            if row == 0 and col == 0: ctx = 0
            elif row + col < 2: ctx += 1
            elif row + col < 4: ctx += 6
            else: ctx += 21
            t.append(('sym', ('coeff_base', ((txSzCtx * 2 + pt) * 42 + ctx) * 5, 4), min(level, 3)))
        if level > 2:
            mag = 0
            for (dr, dc) in ((0, 1), (1, 0), (1, 1)):
                r2, c2 = row + dr, col + dc
                if r2 < 4 and c2 < 4: mag += min(lvl[r2 * 4 + c2], 15)
            m = min((mag + 1) >> 1, 6)
            if row == 0 and col == 0: brctx = m
            elif row < 2 and col < 2: brctx = m + 7
            else: brctx = m + 14
            rem = min(level, 15) - 3
            for k in range(4):
                sym = min(rem, 3)
                t.append(('sym', ('coeff_br', ((min(txSzCtx, 3) * 2 + pt) * 21 + brctx) * 5, 4), sym))
                rem -= sym
                if sym < 3: break
        lvl[pos] = min(level, 127)
    culLevel = 0
    dcCat = 0
    dcSignCtx = 0
    sa = (aboveDc if True else 0)
    s_ = 0
    if sa == 1: s_ -= 1
    elif sa == 2: s_ += 1
    if leftDc == 1: s_ -= 1
    elif leftDc == 2: s_ += 1
    dcSignCtx = 1 if s_ < 0 else (2 if s_ > 0 else 0)
    for c in range(eob):
        pos = DIAG4[c]
        level, neg = levels.get(pos, (0, False))
        if level != 0:
            if c == 0:
                t.append(('sym', ('dc_sign', (pt * 3 + dcSignCtx) * 3, 2), 1 if neg else 0))
                dcCat = 1 if neg else 2
            else:
                t.append(('bit', None, 1 if neg else 0))
            if level >= 15:
                g = level - 15
                lz = 0
                while (1 << (lz + 1)) - 1 <= g: lz += 1
                rem = g - ((1 << lz) - 1)
                for i in range(lz): t.append(('bit', None, 0))
                t.append(('bit', None, 1))
                for i in range(lz): t.append(('bit', None, (rem >> (lz - 1 - i)) & 1))
            culLevel += level
    return t, min(culLevel, 63), dcCat

def gen(seed):
    rnd = random.Random(seed)
    # one 8x8 block: ym=DC, uv=DC (cfl-allowed group), 4 luma + 2 chroma 4x4 txs
    tgt = [('sym', ('partition', 0, 4), 0),
           ('sym', ('skip', 0, 2), 0),
           ('sym', ('kf_y_mode', 0, 13), 0),
           ('sym', ('uv_mode', 13 * 15, 14), 0)]
    # luma blocks at (0,0),(0,1),(1,0),(1,1); ctx via above/left culLevels
    aCul = [0, 0]; lCul = [0, 0]; aDc = [0, 0]; lDc = [0, 0]
    SKC = S.__dict__.get('SkipContexts') or [
        [1, 2, 2, 2, 3], [1, 4, 4, 4, 5], [1, 4, 4, 4, 5], [1, 4, 4, 4, 5], [1, 4, 4, 4, 6]]
    def rnd_levels(p_any):
        levels = {}
        if rnd.random() < p_any:
            n = rnd.randint(1, 6)
            for _ in range(n):
                pos = rnd.choice(DIAG4[:rnd.randint(1, 16)])
                levels[pos] = (rnd.choice([1, 1, 2, 3, 4, 7, 15, 20, 60]), rnd.random() < 0.5)
        return levels
    for (br_, bc) in ((0, 0), (0, 1), (1, 0), (1, 1)):
        levels = rnd_levels(0.8)
        top = aCul[bc]; left = lCul[br_]
        ctx = SKC[min(min(top, left), 4)][min(top | left, 4)]
        if not levels:
            tgt.append(('sym', ('txb_skip', ctx * 3, 2), 1))
            aCul[bc] = 0; lCul[br_] = 0; aDc[bc] = 0; lDc[br_] = 0
        else:
            tgt.append(('sym', ('txb_skip', ctx * 3, 2), 0))
            sub, cul, dcCat = coef_targets(0, levels, aCul[bc], lCul[br_], aDc[bc], lDc[br_])
            tgt += sub
            aCul[bc] = cul; lCul[br_] = cul; aDc[bc] = dcCat; lDc[br_] = dcCat
    for plane in (1, 2):
        levels = rnd_levels(0.6)
        ctx = 7
        if not levels:
            tgt.append(('sym', ('txb_skip', ctx * 3, 2), 1))
        else:
            tgt.append(('sym', ('txb_skip', ctx * 3, 2), 0))
            sub, cul, dcCat = coef_targets(1, levels, 0, 0, 0, 0)
            tgt += sub
    return tgt

OUT = '/tmp/av1fuzz'
os.makedirs(OUT, exist_ok=True)
npass = 0
for seed in range(int(sys.argv[1]) if len(sys.argv) > 1 else 30):
    tgt = gen(seed)
    try:
        tile = encode_target(tgt, 40)
    except AssertionError as e:
        print(seed, 'encode infeasible', str(e)[:50]); continue
    obu = obu8(tile)
    try:
        w, h, layout, planes = H.dav1d_decode(obu)
    except Exception as e:
        print(seed, 'dav1d refused'); continue
    with open(f'{OUT}/fz{seed:03d}.obu', 'wb') as f: f.write(obu)
    with open(f'{OUT}/fz{seed:03d}.golden', 'wb') as f:
        f.write(struct.pack('<HHB', w, h, layout))
        for p in planes: f.write(p)
    npass += 1
print('generated', npass)
