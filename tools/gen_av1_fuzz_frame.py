"""Frame-level differential fuzzer: random 16x16 lossless frames
(partition tree, modes, angles, chroma pairing, coefficients), golden
from dav1d, checked against the Scala decoder."""
import os, random, struct, sys, glob
sys.path.insert(0, '/tmp/av1x'); sys.path.insert(0, 'tools')
import steerlib as S
from steerlib import encode_target
import av1_harness as H
exec(open('tools/coefgen.py').read().split('def gen(')[0])

SEQ16 = bytes.fromhex('000000019ff8fff00080')
def obu16(tile):
    payload = bytes.fromhex('10008000') + tile
    return bytes([0x12, 0x00, 0x0a, len(SEQ16)]) + SEQ16 + bytes([0x32, len(payload)]) + payload

IMC = [0, 1, 2, 3, 4, 4, 4, 4, 3, 0, 1, 2, 0]
SKC = [[1, 2, 2, 2, 3], [1, 4, 4, 4, 5], [1, 4, 4, 4, 5], [1, 4, 4, 4, 5], [1, 4, 4, 4, 6]]

class Frame:
    """mirrors the Scala FrameDecode ctx state for a 16x16 frame (miCols=4)"""
    def __init__(self, rnd):
        self.rnd = rnd
        self.t = []
        self.mi = 4
        self.yMode = [[0]*self.mi for _ in range(self.mi)]
        self.skip = [[0]*self.mi for _ in range(self.mi)]
        self.abovePart = [0]*self.mi
        self.leftPart = [0]*self.mi
        # coef ctx: luma above[4]/left[4]; chroma above[2]/left[2] per plane
        self.aC = {0:[0]*4, 1:[0]*2, 2:[0]*2}
        self.lC = {0:[0]*4, 1:[0]*2, 2:[0]*2}

    def sym(self, name, off, n, want):
        self.t.append(('sym', (name, off, n), want))

    def partition_ctx(self, r, c, bsl):
        a = (self.abovePart[c] >> bsl) & 1
        l = (self.leftPart[r] >> bsl) & 1
        return (bsl - 1) * 4 + l * 2 + a

    def update_part(self, r, c, subSize_w4, subSize_h4, bw4, bh4):
        av = (31 << subSize_w4.bit_length()) & 31
        lv = (31 << subSize_h4.bit_length()) & 31
        for i in range(bw4):
            if c + i < self.mi: self.abovePart[c + i] = av
        for i in range(bh4):
            if r + i < self.mi: self.leftPart[r + i] = lv

    def decode_partition(self, r, c, size4):
        if r >= self.mi or c >= self.mi: return
        if size4 > 1:
            bsl = size4.bit_length() - 1  # 2 for 16x16(4), 1 for 8x8(2)
            ctx = self.partition_ctx(r, c, bsl)
            nsym = 4 if size4 == 2 else 10
            p = self.rnd.choice([0, 3] if size4 > 1 else [0])
            # bias: mostly NONE at 16, mix at 8
            p = self.rnd.choice([0, 0, 3]) if size4 == 4 else self.rnd.choice([0, 0, 0, 3])
            self.sym('partition', ctx * 11, nsym, p)
            if p == 3:
                h = size4 // 2
                self.decode_partition(r, c, h)
                self.decode_partition(r, c + h, h)
                self.decode_partition(r + h, c, h)
                self.decode_partition(r + h, c + h, h)
                return
            self.decode_block(r, c, size4)
            self.update_part(r, c, size4, size4, size4, size4)
        else:
            self.decode_block(r, c, 1)
            self.update_part(r, c, 1, 1, 1, 1)

    def block_coefs(self, plane, pr, pc, tw4, multiTx=False):
        """one 4x4 tx at plane 4-unit coords"""
        rnd = self.rnd
        levels = {}
        if rnd.random() < 0.75:
            n = rnd.randint(1, 5)
            for _ in range(n):
                pos = rnd.choice(DIAG4[:rnd.randint(1, 16)])
                levels[pos] = (rnd.choice([1, 1, 2, 3, 4, 7, 15, 20]), rnd.random() < 0.5)
        aL = self.aC[plane]; lL = self.lC[plane]
        top = aL[pc] & 63; left = lL[pr] & 63
        if plane == 0:
            ctx = SKC[min(min(top, left), 4)][min(top | left, 4)]
        else:
            ctx = 7 + (3 if multiTx else 0) + (1 if top != 0 else 0) + (1 if left != 0 else 0)
        if not levels:
            self.sym('txb_skip', ctx * 3, 2, 1)
            aL[pc] = 0; lL[pr] = 0
            return
        self.sym('txb_skip', ctx * 3, 2, 0)
        aDc = (aL[pc] >> 6) & 3
        lDc = (lL[pr] >> 6) & 3
        sub, cul, dcCat = coef_targets(plane, levels, 0, 0, aDc, lDc)
        self.t += sub
        aL[pc] = cul | (dcCat << 6); lL[pr] = cul | (dcCat << 6)

    def decode_block(self, r, c, size4):
        rnd = self.rnd
        availU = r > 0; availL = c > 0
        skipCtx = (1 if availU and self.skip[r-1][c] else 0) + (1 if availL and self.skip[r][c-1] else 0)
        sk = 1 if rnd.random() < 0.2 else 0
        self.sym('skip', skipCtx * 3, 2, sk)
        am = self.yMode[r-1][c] if availU else 0
        lm = self.yMode[r][c-1] if availL else 0
        ym = rnd.choice([0, 0, 1, 2, 9, 12])
        self.sym('kf_y_mode', (IMC[am] * 5 + IMC[lm]) * 14, 13, ym)
        if 1 <= ym <= 8 and size4 >= 2:
            self.sym('angle_delta', (ym - 1) * 8, 7, rnd.choice([2, 3, 3, 4]))
        hasChroma = ((r & 1) or size4 >= 2) and ((c & 1) or size4 >= 2)
        uv = 0
        if hasChroma:
            cflAllowed = (max(size4 >> 1, 1) == 1)
            if cflAllowed:
                uv = rnd.choice([0, 0, 2, 9])
                self.sym('uv_mode', (13 + ym) * 15, 14, uv)
            else:
                uv = rnd.choice([0, 0, 1, 12])
                self.sym('uv_mode', ym * 15, 13, uv)
            if 1 <= uv <= 8 and size4 >= 2:
                self.sym('angle_delta', (uv - 1) * 8, 7, 3)
        for i in range(size4):
            for j in range(size4):
                self.yMode[r+i][c+j] = ym
                self.skip[r+i][c+j] = sk
        if not sk:
            for ty in range(size4):
                for tx in range(size4):
                    self.block_coefs(0, r + ty, c + tx, 1)
        if hasChroma:
            rC = (r & ~1) if size4 == 1 else r
            cC = (c & ~1) if size4 == 1 else c
            if not sk:
                # chroma 4x4 for both 8x8 and paired-4x4 cases in 16x16 frames
                n4 = max(size4 >> 1, 1)
                multi = n4 > 1
                for ty in range(n4):
                    for tx in range(n4):
                        self.block_coefs(1, (rC >> 1) + ty, (cC >> 1) + tx, 1, multi)
                for ty in range(n4):
                    for tx in range(n4):
                        self.block_coefs(2, (rC >> 1) + ty, (cC >> 1) + tx, 1, multi)

def gen(seed):
    rnd = random.Random(seed)
    f = Frame(rnd)
    f.decode_partition(0, 0, 4)
    return f.t

OUT = '/tmp/av1fuzz2'
os.makedirs(OUT, exist_ok=True)
for fn in glob.glob(OUT + '/*'): os.remove(fn)
n = 0
for seed in range(int(sys.argv[1]) if len(sys.argv) > 1 else 40):
    try:
        tile = encode_target(gen(seed), 60)
    except AssertionError as e:
        print(seed, 'infeasible', str(e)[:40]); continue
    obu = obu16(tile)
    try:
        w, h, layout, planes = H.dav1d_decode(obu)
    except Exception:
        print(seed, 'dav1d refused'); continue
    with open(f'{OUT}/g{seed:03d}.obu', 'wb') as fo: fo.write(obu)
    with open(f'{OUT}/g{seed:03d}.golden', 'wb') as fo:
        fo.write(struct.pack('<HHB', w, h, layout))
        for p in planes: fo.write(p)
    n += 1
print('generated', n)
