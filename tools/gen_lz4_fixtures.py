#!/usr/bin/env python3
"""Dev-time generator for the LZ4 decoder's golden fixtures.

Same scheme as gen_zstd_fixtures.py / gen_xz_fixtures.py:
DETERMINISTIC payloads (shared LCG/pattern definitions, mirrored in
Lz4Spec.scala) compressed with the system lz4 CLI (v1.9.4); only the
.lz4 frames are committed.

Run from the repo root:  python3 tools/gen_lz4_fixtures.py
"""
import subprocess, os, hashlib, tempfile

OUT = os.path.join(os.path.dirname(__file__), '..', 'src', 'test', 'resources', 'lz4')


def lcg_stream(n, mod):
    x = 42
    out = []
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        out.append((x >> 33) % mod)
    return out


WORDS = ['alpha', 'beta', 'gamma', 'delta', 'epsilon',
         'zeta', 'eta', 'theta', 'iota', 'kappa']


def payloads():
    text = ('the quick brown fox jumps over the lazy dog. ' * 20).encode()
    big = (' '.join(WORDS[i] for i in lcg_stream(60000, 10))).encode()
    # defaults: 4 MiB blocks, block-independent, content checksum on
    yield 'small_text', text, ['-1']
    yield 'big_text_hc', big, ['-9']                        # HC match search, same block format
    yield 'big_text_b4', big, ['-6', '-B4']                 # 64 KiB blocks -> multi-block walk
    yield 'big_text_b4d', big, ['-6', '-B4', '-BD']         # block-DEPENDENT (cross-block matches)
    yield 'big_text_bx', big, ['-6', '-B5', '-BX']          # per-block xxh32 checksums
    yield 'big_text_nocrc', big, ['-6', '--no-frame-crc']   # no content checksum leg
    yield 'big_text_csize', big, ['-6', '--content-size']   # declared content size leg
    yield 'random_bytes', bytes(lcg_stream(5000, 256)), ['-6']   # uncompressed blocks
    yield 'runs', b'z' * 100000, ['-6']                     # overlap copies (offset 1)
    yield 'tiny', b'a', ['-1']
    yield 'empty', b'', ['-6']
    yield 'legacy', big, ['-6', '-l']                       # legacy frame (0x184C2102)


def main():
    os.makedirs(OUT, exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        for name, data, args in payloads():
            src = os.path.join(td, name + '.bin')
            open(src, 'wb').write(data)
            out = subprocess.run(['lz4', '-c'] + args + [src], check=True,
                                 capture_output=True).stdout
            open(os.path.join(OUT, name + '.lz4'), 'wb').write(out)
            print(f'{name}: {len(data)} -> {len(out)} bytes, '
                  f'md5 {hashlib.md5(data).hexdigest()}')
        # concatenated frames: two independent frames back-to-back decode as one stream
        a = subprocess.run(['lz4', '-c', '-1'], input=b'first frame|', check=True,
                           capture_output=True).stdout
        b = subprocess.run(['lz4', '-c', '-9'], input=b'second frame', check=True,
                           capture_output=True).stdout
        open(os.path.join(OUT, 'concat.lz4'), 'wb').write(a + b)
        print(f'concat: {len(a) + len(b)} bytes (two frames)')
        # skippable frame prepended (user-metadata framing some pipelines emit)
        skip = (0x184D2A50).to_bytes(4, 'little') + (12).to_bytes(4, 'little') + b'metadata:ok!'
        open(os.path.join(OUT, 'skippable.lz4'), 'wb').write(skip + a)
        print(f'skippable: {len(skip) + len(a)} bytes')


if __name__ == '__main__':
    main()
