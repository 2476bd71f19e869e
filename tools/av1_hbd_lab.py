#!/usr/bin/env python3
"""Dev-time 10-bit AV1 probe lab: encode deterministic 10-bit images
with the system libaom at controlled settings, pin goldens from
libdav1d, and write .obu/.golden pairs (wide golden format: layout
byte bit 7 set, planes as LE u16) for graft.tools.Av1Debug."""
import os, struct, sys
sys.path.insert(0, os.path.dirname(__file__))
import av1_harness as H

OUT = sys.argv[1] if len(sys.argv) > 1 else '/tmp/av1hbd'
os.makedirs(OUT, exist_ok=True)

def planes10(w, h, kind, seed=42):
    cw, ch = (w + 1) // 2, (h + 1) // 2
    if kind == 'flat':
        return [512]*(w*h), [400]*(cw*ch), [800]*(cw*ch)
    if kind == 'grad':
        y = [ (8*r + 12*c) & 1023 for r in range(h) for c in range(w) ]
        u = [ (512 + 4*r) & 1023 for r in range(ch) for _ in range(cw) ]
        v = [ (480 + 2*(c//2)) & 1023 for _ in range(ch) for c in range(cw) ]
        return y, u, v
    if kind == 'noise':
        b = H.lcg_words(w*h + 2*cw*ch, 10, seed)
        return b[:w*h], b[w*h:w*h+cw*ch], b[w*h+cw*ch:]
    if kind == 'photo':
        y = [0]*(w*h)
        for r in range(h):
            for c in range(w):
                base = 480 + 240*r//h - 160*c//w
                d2 = (r - h//3)**2 + (c - w//2)**2
                disc = 280 if d2 < (min(w,h)//4)**2 else 0
                tex = ((r*7 + c*13) % 5)*4 - 8
                y[r*w+c] = max(0, min(1023, base + disc + tex))
        u = [ max(0, min(1023, 440 + 120*r//ch)) for r in range(ch) for _ in range(cw) ]
        v = [ max(0, min(1023, 560 - 100*c//cw)) for _ in range(ch) for c in range(cw) ]
        return y, u, v
    raise AssertionError(kind)

def probe(name, w, h, kind, controls, min_q, max_q, seed=42,
          usage=H.AOM_USAGE_ALL_INTRA, write=True):
    pl = planes10(w, h, kind, seed)
    obu = H.encode_av1_hbd(w, h, pl, controls, min_q=min_q, max_q=max_q, usage=usage)
    dw, dh, layout, bpc, golden = H.dav1d_decode_ex(obu)
    assert (dw, dh, bpc) == (w, h, 10), (name, dw, dh, bpc)
    if min_q == 0 and max_q == 0:
        assert list(golden[0]) == list(pl[0]) and list(golden[1]) == list(pl[1]) \
            and list(golden[2]) == list(pl[2]), name + ": lossless round-trip broke"
    if write:
        with open(os.path.join(OUT, name + '.obu'), 'wb') as f:
            f.write(obu)
        with open(os.path.join(OUT, name + '.golden'), 'wb') as f:
            f.write(struct.pack('<HHB', w, h, layout | 0x80))
            for p in golden:
                f.write(struct.pack('<%dH' % len(p), *p))
    print('%-26s %4dx%-4d obu=%6dB' % (name, w, h, len(obu)))
    return obu, golden

C = lambda *xs: list(xs)
CPU = H.AOME_SET_CPUUSED
CQ = H.AOME_SET_CQ_LEVEL
CDEF = H.AV1E_SET_ENABLE_CDEF
LR = H.AV1E_SET_ENABLE_RESTORATION

if __name__ == '__main__':
    which = sys.argv[2] if len(sys.argv) > 2 else 'base'
    if which == 'base':
        # stage 1: lossless + plain lossy, filters off
        probe('hb_ll_grad64', 64, 64, 'grad', C((CPU,6),(CDEF,0),(LR,0)), 0, 0)
        probe('hb_ll_noise64', 64, 64, 'noise', C((CPU,6),(CDEF,0),(LR,0)), 0, 0)
        probe('hb_q32_grad64', 64, 64, 'grad', C((CPU,6),(CQ,32),(CDEF,0),(LR,0)), 32, 32)
        probe('hb_q50_noise64', 64, 64, 'noise', C((CPU,6),(CQ,50),(CDEF,0),(LR,0)), 50, 50)
        probe('hb_q32_photo128', 128, 128, 'photo', C((CPU,5),(CQ,32),(CDEF,0),(LR,0)), 32, 32)
        probe('hb_q20_photo64', 64, 64, 'photo', C((CPU,6),(CQ,20),(CDEF,0),(LR,0)), 20, 20)
        probe('hb_q32_odd65x40', 65, 40, 'photo', C((CPU,6),(CQ,32),(CDEF,0),(LR,0)), 32, 32)
    elif which == 'filters':
        # stage 2: deblock+cdef+lr on
        probe('hb_cdef_n55', 64, 64, 'noise', C((CPU,6),(CQ,55),(LR,0)), 55, 55)
        probe('hb_cdef_p50', 128, 128, 'photo', C((CPU,5),(CQ,50),(LR,0)), 50, 50)
        probe('hb_cdef_odd100x36', 100, 36, 'photo', C((CPU,6),(CQ,50),(LR,0)), 50, 50)
        probe('hb_lr_photo128', 128, 128, 'photo', C((CPU,3),(CQ,45)), 45, 45,
              usage=H.AOM_USAGE_GOOD_QUALITY)
        probe('hb_lr_noise128', 128, 128, 'noise', C((CPU,3),(CQ,50)), 50, 50,
              usage=H.AOM_USAGE_GOOD_QUALITY)
        probe('hb_lr_photo256', 256, 256, 'photo', C((CPU,2),(CQ,40)), 40, 40,
              usage=H.AOM_USAGE_GOOD_QUALITY)
    elif which == 'sweep':
        # wide behavioral sweep, no files: q x cpu x kind x dims
        import itertools
        n = 0
        for q, cpu, kind, (w, h) in itertools.product(
                [5, 20, 32, 45, 60], [0, 3, 6], ['grad','noise','photo'],
                [(64,64),(100,36),(65,40),(128,128)]):
            name = 'sw_%s_q%d_c%d_%dx%d' % (kind, q, cpu, w, h)
            probe(name, w, h, kind, C((CPU,cpu),(CQ,q)), q, q, write=True)
            n += 1
        print('%d sweep probes written' % n)
