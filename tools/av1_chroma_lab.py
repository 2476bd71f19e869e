#!/usr/bin/env python3
"""Dev-time 4:4:4 / 4:2:2 probe lab (8- and 10-bit): libaom encodes at
profile 1/2, dav1d goldens, .obu/.golden pairs for graft.tools.Av1Debug."""
import os, struct, sys
sys.path.insert(0, os.path.dirname(__file__))
import av1_harness as H

OUT = sys.argv[1] if len(sys.argv) > 1 else '/tmp/av1chroma'
os.makedirs(OUT, exist_ok=True)

def mkplanes(w, h, kind, sub, bits, seed=42):
    sx, sy = sub
    cw, ch = (w+sx)>>sx, (h+sy)>>sy
    mx = (1 << bits) - 1
    sc = bits - 8
    if kind == 'grad':
        y = [ ((2*r + 3*c) << sc) & mx for r in range(h) for c in range(w) ]
        u = [ ((128 + r) << sc) & mx for r in range(ch) for _ in range(cw) ]
        v = [ ((120 + c//2) << sc) & mx for _ in range(ch) for c in range(cw) ]
        return y, u, v
    if kind == 'noise':
        b = H.lcg_words(w*h + 2*cw*ch, bits, seed)
        return b[:w*h], b[w*h:w*h+cw*ch], b[w*h+cw*ch:]
    if kind == 'photo':
        y = [0]*(w*h)
        for r in range(h):
            for c in range(w):
                base = (120 + 60*r//h - 40*c//w)
                d2 = (r - h//3)**2 + (c - w//2)**2
                disc = 70 if d2 < (min(w,h)//4)**2 else 0
                tex = ((r*7 + c*13) % 5) - 2
                y[r*w+c] = max(0, min(255, base + disc + tex)) << sc
        u = [ max(0, min(255, 110 + 30*r//ch)) << sc for r in range(ch) for _ in range(cw) ]
        v = [ max(0, min(255, 140 - 25*c//cw)) << sc for _ in range(ch) for c in range(cw) ]
        return y, u, v
    raise AssertionError(kind)

def probe(name, w, h, kind, controls, min_q, max_q, sub, bits=8, seed=42,
          usage=H.AOM_USAGE_ALL_INTRA):
    pl = mkplanes(w, h, kind, sub, bits, seed)
    obu = H.encode_av1_gen(w, h, pl, controls, min_q=min_q, max_q=max_q,
                           usage=usage, bit_depth=bits, sub=sub)
    dw, dh, layout, bpc, golden = H.dav1d_decode_ex(obu)
    assert (dw, dh, bpc) == (w, h, bits), (name, dw, dh, bpc)
    if min_q == 0 and max_q == 0:
        for i in range(3):
            assert list(golden[i]) == list(pl[i]), (name, 'lossless broke plane', i)
    wide = bits > 8
    with open(os.path.join(OUT, name + '.obu'), 'wb') as f:
        f.write(obu)
    with open(os.path.join(OUT, name + '.golden'), 'wb') as f:
        f.write(struct.pack('<HHB', w, h, layout | (0x80 if wide else 0)))
        for p in golden:
            f.write(struct.pack('<%d%s' % (len(p), 'H' if wide else 'B'), *p))
    print('%-28s %4dx%-4d sub=%s bits=%d obu=%6dB' % (name, w, h, sub, bits, len(obu)))

CPU, CQ = H.AOME_SET_CPUUSED, H.AOME_SET_CQ_LEVEL

if __name__ == '__main__':
    which = sys.argv[2] if len(sys.argv) > 2 else 'base'
    if which == 'base':
        for tag, sub in [('444', (0,0)), ('422', (1,0))]:
            probe('c%s_ll_grad64' % tag, 64, 64, 'grad', [(CPU,6)], 0, 0, sub)
            probe('c%s_q32_photo64' % tag, 64, 64, 'photo', [(CPU,6),(CQ,32)], 32, 32, sub)
            probe('c%s_q50_noise64' % tag, 64, 64, 'noise', [(CPU,6),(CQ,50)], 50, 50, sub)
            probe('c%s_q32_odd65x40' % tag, 65, 40, 'photo', [(CPU,6),(CQ,32)], 32, 32, sub)
    elif which == 'sweep':
        import itertools
        n = 0
        for sub, tag in [((0,0),'444'), ((1,0),'422')]:
            for q, cpu, kind, (w, h), bits in itertools.product(
                    [5, 20, 32, 50], [0, 3, 6], ['grad','noise','photo'],
                    [(64,64),(100,36),(128,128)], [8, 10]):
                if bits == 10 and cpu == 3: continue  # trim the grid a bit
                name = 'c%s_%s_q%d_c%d_b%d_%dx%d' % (tag, kind, q, cpu, bits, w, h)
                probe(name, w, h, kind, [(CPU,cpu),(CQ,q)], q, q, sub, bits)
                n += 1
        print('%d sweep probes' % n)
