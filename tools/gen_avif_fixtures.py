#!/usr/bin/env python3
"""Dev-time generator for the AVIF pixel-decode fixtures.

Single-item and alpha AVIFs come from the SYSTEM libheif (libaom
encode); the grid-tiled AVIF is muxed here from four libaom lossless
solid-color tiles (libheif in this image has no grid-encode API), then
verified readable by libheif's own parser. The committed fixtures feed
HeifSpec and the media_avif_* gates; the AV1 payloads themselves are
bit-exact-validated against libdav1d by Av1DecoderSpec's machinery.

Run from the repo root:  python3 tools/gen_avif_fixtures.py
"""
import ctypes, os, struct, sys

sys.path.insert(0, os.path.dirname(__file__))
import av1_harness as H
import gen_heif_fixtures as G

OUT = os.path.join(os.path.dirname(__file__), '..', 'src', 'test', 'resources', 'avif')


def box(typ, payload):
    return struct.pack('>I', 8 + len(payload)) + typ + payload


def fullbox(typ, version, flags, payload):
    return box(typ, struct.pack('>B', version) + struct.pack('>I', flags)[1:] + payload)


def mux_grid(tiles, tile_w, tile_h, rows, cols, out_w, out_h):
    """Minimal valid AVIF: grid primary (construction_method=1 via idat),
    av01 tiles in mdat, per-item av1C+ispe properties, dimg refs."""
    n = len(tiles)
    grid_id = 1
    tile_ids = list(range(2, 2 + n))

    ftyp = box(b'ftyp', b'avif' + struct.pack('>I', 0) + b'avifmif1miaf')

    hdlr = fullbox(b'hdlr', 0, 0, struct.pack('>I', 0) + b'pict' + b'\0' * 12 + b'\0')
    pitm = fullbox(b'pitm', 0, 0, struct.pack('>H', grid_id))

    infes = [fullbox(b'infe', 2, 0, struct.pack('>HH', grid_id, 0) + b'grid\0')]
    for tid in tile_ids:
        infes.append(fullbox(b'infe', 2, 1, struct.pack('>HH', tid, 0) + b'av01\0'))
    iinf = fullbox(b'iinf', 0, 0, struct.pack('>H', 1 + n) + b''.join(infes))

    # properties: 1=ispe(grid), 2=pixi, 3=av1C, 4=ispe(tile)
    ispe_g = fullbox(b'ispe', 0, 0, struct.pack('>II', out_w, out_h))
    pixi = fullbox(b'pixi', 0, 0, bytes([3, 8, 8, 8]))
    # minimal av1C: marker|version=0x81, profile/level, flags (8-bit 420)
    av1c = box(b'av1C', bytes([0x81, 0x04, 0x0c, 0x00]))
    ispe_t = fullbox(b'ispe', 0, 0, struct.pack('>II', tile_w, tile_h))
    ipco = box(b'ipco', ispe_g + pixi + av1c + ispe_t)
    entries = [struct.pack('>HB', grid_id, 2) + bytes([0x80 | 1, 0x80 | 2])]
    for tid in tile_ids:
        entries.append(struct.pack('>HB', tid, 2) + bytes([0x80 | 3, 0x80 | 4]))
    ipma = fullbox(b'ipma', 0, 0, struct.pack('>I', 1 + n) + b''.join(entries))
    iprp = box(b'iprp', ipco + ipma)

    dimg = box(b'dimg', struct.pack('>HH', grid_id, n) +
               b''.join(struct.pack('>H', t) for t in tile_ids))
    iref = fullbox(b'iref', 0, 0, dimg)

    grid_desc = bytes([0, 0, rows - 1, cols - 1]) + struct.pack('>HH', out_w, out_h)
    idat = box(b'idat', grid_desc)

    # iloc: version 1 (construction_method); grid via idat (cm=1),
    # tiles via file offsets (cm=0). Two passes to fix offsets.
    def build_iloc(tile_offsets):
        items = []
        items.append(struct.pack('>HHH', grid_id, 1, 0) + struct.pack('>I', 0) +
                     struct.pack('>H', 1) + struct.pack('>II', 0, len(grid_desc)))
        for tid, (off, ln) in zip(tile_ids, tile_offsets):
            items.append(struct.pack('>HHH', tid, 0, 0) + struct.pack('>I', 0) +
                         struct.pack('>H', 1) + struct.pack('>II', off, ln))
        body = bytes([0x44, 0x40]) + struct.pack('>H', 1 + n) + b''.join(items)
        return fullbox(b'iloc', 1, 0, body)

    # assemble with dummy offsets to measure layout, then rewrite
    dummy = [(0, len(t)) for t in tiles]
    meta_payload = hdlr + pitm + build_iloc(dummy) + iinf + iprp + iref + idat
    meta = fullbox(b'meta', 0, 0, meta_payload)
    mdat_start = len(ftyp) + len(meta) + 8
    offs = []
    at = mdat_start
    for t in tiles:
        offs.append((at, len(t)))
        at += len(t)
    meta_payload = hdlr + pitm + build_iloc(offs) + iinf + iprp + iref + idat
    meta = fullbox(b'meta', 0, 0, meta_payload)
    assert len(ftyp) + len(meta) + 8 == mdat_start, "iloc size changed between passes"
    mdat = box(b'mdat', b''.join(tiles))
    return ftyp + meta + mdat


def flat_tile(w, h, y, u, v):
    cw, ch = (w + 1) // 2, (h + 1) // 2
    return H.encode_av1(w, h, (bytes([y] * (w * h)), bytes([u] * (cw * ch)),
                              bytes([v] * (cw * ch))), [(98, 0)], min_q=0, max_q=0)


def planted_yuv(fi, ti):
    """Deterministic planted tile color, replayed verbatim in the gate's
    DuckDB oracle SQL."""
    return ((30 + fi * 40 + ti * 25) % 200 + 20,
            (fi * 70 + ti * 50) % 256,
            (fi * 90 + ti * 35 + 100) % 256)


# the PDQ gate's grid series: (rows, cols, tile_w, tile_h, out_w, out_h)
PDQ_GRIDS = [
    (2, 2, 64, 48, 128, 96),
    (2, 2, 64, 48, 100, 90),    # cropped
    (3, 2, 32, 32, 64, 96),
    (2, 3, 32, 32, 96, 64),
    (1, 2, 64, 64, 128, 64),
    (2, 1, 64, 64, 64, 128),
]


def gen_pdq_grids():
    import base64
    out = []
    for fi, (rows, cols, tw, th, ow, oh) in enumerate(PDQ_GRIDS):
        tiles = []
        for ti in range(rows * cols):
            y, u, v = planted_yuv(fi, ti)
            tiles.append(flat_tile(tw, th, y, u, v))
        data = mux_grid(tiles, tw, th, rows, cols, ow, oh)
        path = os.path.join(OUT, 'avif_pdq_%d.avif' % fi)
        with open(path, 'wb') as f:
            f.write(data)
        print('avif_pdq_%d' % fi, G.pin(path), len(data), 'bytes')
        out.append(base64.b64encode(data).decode())
    with open('/tmp/avif_pdq_b64.txt', 'w') as f:
        for fi, b in enumerate(out):
            f.write('%d %s\n' % (fi, b))
    print('base64 blobs -> /tmp/avif_pdq_b64.txt')


def main():
    os.makedirs(OUT, exist_ok=True)
    G.setup()
    G.OUT = OUT
    # real libheif encodes (filter-intra on, various q/dims/alpha)
    for name, w, h, alpha, q in [('avif_rgb_64x48', 64, 48, False, 60),
                                 ('avif_alpha_48x48', 48, 48, True, 70),
                                 ('avif_odd_33x17', 33, 17, False, 30)]:
        G.encode(name + '.avif', G.AV1, w, h, alpha, quality=q)
        print(name, G.pin(os.path.join(OUT, name + '.avif')))
    # hand-muxed 2x2 lossless grid, output cropped to 100x90
    tiles = [flat_tile(64, 48, 81, 90, 240), flat_tile(64, 48, 145, 54, 34),
             flat_tile(64, 48, 41, 240, 110), flat_tile(64, 48, 210, 16, 146)]
    data = mux_grid(tiles, 64, 48, 2, 2, 100, 90)
    path = os.path.join(OUT, 'avif_grid_100x90.avif')
    with open(path, 'wb') as f:
        f.write(data)
    print('avif_grid_100x90', G.pin(path))
    gen_pdq_grids()


if __name__ == '__main__':
    main()
