#!/usr/bin/env python3
"""Dev-time: hand-mux a single-item 10-bit AVIF around a libaom
10-bit encode, compute the media_avif_decode quadrant pins OUTSIDE
the engine (libdav1d decode + the engine-documented downshift+BT.601
transform), and print the base64 blob + oracle row."""
import base64, os, struct, sys
sys.path.insert(0, os.path.dirname(__file__))
import av1_harness as H
from gen_avif_fixtures import box, fullbox

def mux_single(obu, w, h, bd=10):
    ftyp = box(b'ftyp', b'avif' + struct.pack('>I', 0) + b'avifmif1miaf')
    hdlr = fullbox(b'hdlr', 0, 0, struct.pack('>I', 0) + b'pict' + b'\0' * 12 + b'\0')
    pitm = fullbox(b'pitm', 0, 0, struct.pack('>H', 1))
    infe = fullbox(b'infe', 2, 1, struct.pack('>HH', 1, 0) + b'av01\0')
    iinf = fullbox(b'iinf', 0, 0, struct.pack('>H', 1) + infe)
    ispe = fullbox(b'ispe', 0, 0, struct.pack('>II', w, h))
    pixi = fullbox(b'pixi', 0, 0, bytes([3, bd, bd, bd]))
    hbdflag = 0x40 if bd > 8 else 0
    av1c = box(b'av1C', bytes([0x81, 0x04, hbdflag | 0x0c, 0x00]))
    ipco = box(b'ipco', ispe + pixi + av1c)
    ipma = fullbox(b'ipma', 0, 0, struct.pack('>I', 1) +
                   struct.pack('>HB', 1, 3) + bytes([0x80 | 1, 0x80 | 2, 0x80 | 3]))
    iprp = box(b'iprp', ipco + ipma)
    def build_iloc(off):
        item = (struct.pack('>HHH', 1, 0, 0) + struct.pack('>I', 0) +
                struct.pack('>H', 1) + struct.pack('>II', off, len(obu)))
        return fullbox(b'iloc', 1, 0, bytes([0x44, 0x40]) + struct.pack('>H', 1) + item)
    meta_payload = hdlr + pitm + build_iloc(0) + iinf + iprp
    meta = fullbox(b'meta', 0, 0, meta_payload)
    mdat_start = len(ftyp) + len(meta) + 8
    meta = fullbox(b'meta', 0, 0, hdlr + pitm + build_iloc(mdat_start) + iinf + iprp)
    return ftyp + meta + box(b'mdat', obu)

def pins(obu):
    w, h, layout, bpc, planes = H.dav1d_decode_ex(obu)
    sx = sy = 1
    cw = (w + sx) >> sx
    ds = bpc - 8
    def clip(v): return 0 if v < 0 else (255 if v > 255 else v)
    def rgb(x, y):
        yv = planes[0][y * w + x] >> ds
        uv = planes[1][(y >> sy) * cw + (x >> sx)] >> ds
        vv = planes[2][(y >> sy) * cw + (x >> sx)] >> ds
        yS = (yv * 19077) >> 8
        r = clip((yS + ((vv * 26149) >> 8) - 14234) >> 6)
        g = clip((yS - ((uv * 6419) >> 8) - ((vv * 13320) >> 8) + 8708) >> 6)
        b = clip((yS + ((uv * 33050) >> 8) - 17685) >> 6)
        return (0xff << 24) | (r << 16) | (g << 8) | b
    q = [rgb(fx * w // 4, fy * h // 4) & 0xffffffff
         for (fx, fy) in [(1, 1), (3, 1), (1, 3), (3, 3)]]
    return w, h, q

if __name__ == '__main__':
    import importlib.util as ilu
    argv = sys.argv
    sys.argv = ['x', '/tmp/av1hbd']
    spec = ilu.spec_from_file_location('lab', os.path.join(os.path.dirname(__file__), 'av1_hbd_lab.py'))
    lab = ilu.module_from_spec(spec)
    spec.loader.exec_module(lab)
    sys.argv = argv
    pl = lab.planes10(64, 48, 'photo', 42)
    obu = H.encode_av1_hbd(64, 48, pl, [(lab.CPU, 5), (lab.CQ, 30)], min_q=30, max_q=30)
    w, h, q = pins(obu)
    data = mux_single(obu, w, h, 10)
    out = os.path.join(os.path.dirname(__file__), '..', 'src', 'test', 'resources', 'avif', 'avif_hbd_64x48.avif')
    with open(out, 'wb') as f:
        f.write(data)
    print('avif_hbd_64x48:', w, h, len(data), 'bytes')
    print('oracle row:', "('avif_hbd_64x48', %d, %d, false, %d, %d, %d, %d, 'ok')" % (w, h, *q))
    b64 = base64.b64encode(data).decode()
    print('b64 len', len(b64))
    with open('/tmp/avif_hbd_b64.txt', 'w') as f:
        for i in range(0, len(b64), 100):
            f.write(b64[i:i+100] + '\n')
