#!/usr/bin/env python3
"""Dev-time screen-content (palette) probe generator — r12 state.

Produces libaom encodes whose palette decisions are KNOWN from the
planted content (e.g. a 4-color 16x16 quad image -> palette size 4,
colors 0/80/170/255), with dav1d goldens. The graft decoder (run with
AV1_PAL_DEV=1 to lift the screen-content refusal) decodes palette
mode/size/colors bit-exactly against these; the color-index MAP stage
still desyncs (ordering of map vs uv-palette/tx-size unresolved) —
see the r12 SURVEY notes. Usage: python3 tools/gen_av1_palette_probes.py /tmp/av1sc
"""
import os, struct, sys, random
sys.path.insert(0, os.path.dirname(__file__))
import av1_harness as H

OUT = sys.argv[1] if len(sys.argv) > 1 else '/tmp/av1sc'
os.makedirs(OUT, exist_ok=True)

def write(name, w, h, y, u, v, q=20, cpu=6):
    obu = H.encode_av1_gen(w, h, (y, u, v),
                           [(H.AOME_SET_CPUUSED, cpu), (H.AOME_SET_CQ_LEVEL, q)], q, q)
    dw, dh, layout, bpc, golden = H.dav1d_decode_ex(obu)
    with open(os.path.join(OUT, name + '.obu'), 'wb') as f:
        f.write(obu)
    with open(os.path.join(OUT, name + '.golden'), 'wb') as f:
        f.write(struct.pack('<HHB', dw, dh, layout))
        for p in golden:
            f.write(struct.pack('<%dB' % len(p), *p))
    print(name, len(obu))

if __name__ == '__main__':
    # 4-color quads: palette n=4, colors 0/80/170/255
    w = h = 16
    pal = [0, 80, 170, 255]
    y = [pal[(r//4 + c//4) % 4] for r in range(h) for c in range(w)]
    write('mp_quad16', w, h, y, [100]*64, [200]*64)
    # 2-color random: palette n=2, colors 0/255
    for seed in range(4):
        rnd = random.Random(seed + 100)
        y = [(0 if rnd.random() < 0.5 else 255) for _ in range(256)]
        write('mp_r16_%d' % seed, 16, 16, y, [128]*64, [128]*64)
