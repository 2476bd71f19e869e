#!/usr/bin/env python3
"""Dev-time generator for the zstd decoder's golden fixtures.

Compresses DETERMINISTIC payloads with the system zstd CLI (v1.5.x)
and writes the .zst frames into src/test/resources/zstd/. The spec
regenerates each payload from the same LCG/pattern definitions below
(no .bin files in the repo) and requires byte-exact decompression.

Run from the repo root:  python3 tools/gen_zstd_fixtures.py
"""
import subprocess, os, hashlib, tempfile

OUT = os.path.join(os.path.dirname(__file__), '..', 'src', 'test', 'resources', 'zstd')


def lcg_stream(n, mod):
    """The shared deterministic generator: 64-bit LCG, top-bits draw.
    ZstdSpec.scala mirrors this exactly (same constants, same shift)."""
    x = 42
    out = []
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        out.append((x >> 33) % mod)
    return out


WORDS = ['alpha', 'beta', 'gamma', 'delta', 'epsilon',
         'zeta', 'eta', 'theta', 'iota', 'kappa']


def payloads():
    yield 'small_text', ('the quick brown fox jumps over the lazy dog. ' * 20).encode(), ['-3']
    yield 'repetitive', (b'abcabcabc' * 5000) + b'x' * 4000 + (b'the cat sat on the mat. ' * 1000), ['-19']
    yield 'big_text', (' '.join(WORDS[i] for i in lcg_stream(60000, 10))).encode(), ['-6']
    yield 'random_raw', bytes(lcg_stream(5000, 256)), ['-3']
    yield 'nocheck', ('the quick brown fox jumps over the lazy dog. ' * 20).encode(), ['-3', '--no-check']
    yield 'tiny', b'a', ['-1']
    yield 'runs', b'z' * 100000, ['-3']
    yield 'multiblock', (' '.join(WORDS[i] for i in lcg_stream(160000, 10))).encode(), ['-12']
    yield 'empty', b'', ['-3']
    # ~96 skewed printable symbols: forces FSE-COMPRESSED Huffman
    # weights (the small-alphabet texts get direct nibbles) and the
    # 5-byte 18-bit literals header
    vals = lcg_stream(120000, 9216)
    yield 'wide_alpha', bytes(32 + min(v % 96, (v // 96) % 96) for v in vals), ['-9']


def main():
    os.makedirs(OUT, exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        for name, data, args in payloads():
            src = os.path.join(td, name + '.bin')
            dst = os.path.join(OUT, name + '.zst')
            open(src, 'wb').write(data)
            subprocess.run(['zstd', '-f', '-q'] + args + [src, '-o', dst], check=True)
            print(f'{name}: {len(data)} -> {os.path.getsize(dst)} bytes, '
                  f'md5 {hashlib.md5(data).hexdigest()}')


if __name__ == '__main__':
    main()
