#!/usr/bin/env python3
"""Dev-time generator for the bzip2 decoder's golden fixtures.

Same scheme as gen_zstd_fixtures.py: DETERMINISTIC payloads (shared
LCG/pattern definitions, mirrored in Bzip2Spec.scala) compressed with
the system bzip2; only the .bz2 frames are committed.

Run from the repo root:  python3 tools/gen_bzip2_fixtures.py
"""
import subprocess, os, hashlib, tempfile

OUT = os.path.join(os.path.dirname(__file__), '..', 'src', 'test', 'resources', 'bzip2')


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
    yield 'small_text', ('the quick brown fox jumps over the lazy dog. ' * 20).encode(), '-9'
    yield 'big_text', (' '.join(WORDS[i] for i in lcg_stream(60000, 10))).encode(), '-9'
    # > 100k forces multi-block at -1 (100k block size)
    yield 'multiblock', (' '.join(WORDS[i] for i in lcg_stream(60000, 10))).encode(), '-1'
    yield 'random_bytes', bytes(lcg_stream(5000, 256)), '-5'
    yield 'runs', b'z' * 100000, '-9'  # RLE1 4+count paths
    yield 'tiny', b'a', '-1'
    yield 'empty', b'', '-9'
    yield 'all_bytes', bytes(lcg_stream(40000, 256)) + bytes(range(256)) * 8, '-3'


def main():
    os.makedirs(OUT, exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        for name, data, level in payloads():
            src = os.path.join(td, name + '.bin')
            dst = os.path.join(OUT, name + '.bz2')
            open(src, 'wb').write(data)
            out = subprocess.run(['bzip2', '-c', level, src], check=True,
                                 capture_output=True).stdout
            open(dst, 'wb').write(out)
            print(f'{name}: {len(data)} -> {len(out)} bytes, '
                  f'md5 {hashlib.md5(data).hexdigest()}')


if __name__ == '__main__':
    main()
