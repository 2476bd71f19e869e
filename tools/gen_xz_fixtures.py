#!/usr/bin/env python3
"""Dev-time generator for the xz/LZMA2 decoder's golden fixtures.

Same scheme as gen_zstd_fixtures.py: DETERMINISTIC payloads (shared
LCG/pattern definitions, mirrored in XzSpec.scala) compressed with the
system xz; only the .xz frames are committed.

Run from the repo root:  python3 tools/gen_xz_fixtures.py
"""
import subprocess, os, hashlib, tempfile

OUT = os.path.join(os.path.dirname(__file__), '..', 'src', 'test', 'resources', 'xz')


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
    yield 'small_text', text, ['-6']
    yield 'big_text', big, ['-9']
    yield 'big_text_crc64', big, ['-6', '--check=crc64']
    yield 'big_text_sha256', big, ['-3', '--check=sha256']
    yield 'random_bytes', bytes(lcg_stream(5000, 256)), ['-6']
    yield 'runs', b'z' * 100000, ['-6']
    yield 'tiny', b'a', ['-1']
    yield 'empty', b'', ['-6']
    yield 'wide_alpha', bytes(32 + min(v % 96, (v // 96) % 96)
                              for v in lcg_stream(120000, 9216)), ['-9e']
    # small block size forces a multi-block stream (block-chain walk)
    yield 'multiblock', big, ['-6', '--block-size=65536']


def code_payload():
    """Fake machine code: byte noise dense in E8/E9/BL-ish patterns so
    every branch converter has sites to rewrite, plus crafted
    call-shaped sequences (E8 + small LE32 + 00/FF top bytes)."""
    noise = bytearray(lcg_stream(40000, 256))
    calls = bytearray()
    for k, v in enumerate(lcg_stream(2000, 1 << 20)):
        op = [0xE8, 0xE9][k % 2]
        top = [0x00, 0xFF][(k // 2) % 2]
        calls += bytes([op, v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0x0F, top])
        calls += bytes([0x90] * (k % 3))
    return bytes(noise + calls + noise)


def filter_payloads():
    code = code_payload()
    big = (' '.join(WORDS[i] for i in lcg_stream(60000, 10))).encode()
    yield 'f_delta1', big, ['--delta=dist=1']
    yield 'f_delta4', code, ['--delta=dist=4']
    yield 'f_x86', code, ['--x86']
    yield 'f_x86_multiblock', code, ['--x86', '--block-size=16384']
    yield 'f_arm', code, ['--arm']
    yield 'f_armthumb', code, ['--armthumb']
    yield 'f_arm64', code, ['--arm64']
    yield 'f_sparc', code, ['--sparc']
    yield 'f_powerpc', code, ['--powerpc']
    yield 'f_delta_x86', code, ['--delta=dist=2', '--x86']  # two pre-filters


def alone_payloads():
    # .lzma "alone" format fixtures (unknown size -> end marker)
    yield 'alone_small', ('the quick brown fox jumps over the lazy dog. ' * 20).encode(), '-6'
    yield 'alone_big', (' '.join(WORDS[i] for i in lcg_stream(60000, 10))).encode(), '-9'
    yield 'alone_empty', b'', '-6'


def main():
    os.makedirs(OUT, exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        for name, data, args in payloads():
            src = os.path.join(td, name + '.bin')
            dst = os.path.join(OUT, name + '.xz')
            open(src, 'wb').write(data)
            out = subprocess.run(['xz', '-c', '-T1'] + args + [src], check=True,
                                 capture_output=True).stdout
            open(dst, 'wb').write(out)
            print(f'{name}: {len(data)} -> {len(out)} bytes, '
                  f'md5 {hashlib.md5(data).hexdigest()}')
        for name, data, args in filter_payloads():
            src = os.path.join(td, name + '.bin')
            open(src, 'wb').write(data)
            out = subprocess.run(
                ['xz', '-c', '-T1'] + args + ['--lzma2=preset=6', src],
                check=True, capture_output=True).stdout
            open(os.path.join(OUT, name + '.xz'), 'wb').write(out)
            print(f'{name}: {len(data)} -> {len(out)} bytes, '
                  f'md5 {hashlib.md5(data).hexdigest()}')
        for name, data, lvl in alone_payloads():
            src = os.path.join(td, name + '.bin')
            open(src, 'wb').write(data)
            out = subprocess.run(['xz', '--format=lzma', '-c', '-T1', lvl, src],
                                 check=True, capture_output=True).stdout
            open(os.path.join(OUT, name + '.lzma'), 'wb').write(out)
            print(f'{name}: {len(data)} -> {len(out)} bytes (.lzma alone)')


if __name__ == '__main__':
    main()
