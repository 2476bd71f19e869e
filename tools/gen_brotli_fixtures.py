#!/usr/bin/env python3
# Dev-time fixture generator for BrotliSpec: compresses a corpus with
# the SYSTEM libbrotli (public, MIT; via the conda brotlicffi binding)
# across qualities 0-11 and window sizes, and stores payload + golden
# (= the original input; brotli is lossless). High-quality text output
# exercises the static dictionary + transforms; quality 0-1 exercises
# the fast one-block path; metadata/empty edge cases are hand-checked.
# Not used at runtime.

import sys, os, struct, random, hashlib
sys.path.insert(0, "/root/miniconda/pkgs/brotlicffi-1.2.0.0-py313h7354ed3_0/lib/python3.13/site-packages")
import brotlicffi

OUT = "/root/repo/src/test/resources/brotli"
os.makedirs(OUT, exist_ok=True)

rnd = random.Random(1234)

WORDS = ("the of and a in to is was it for that are as he on with his they at be "
         "this have from or had by not word but what some we can out other were "
         "all there when up use your how said an each she which do their time if "
         "will way about many then them write would like so these her long make "
         "thing see him two has look more day could go come did number sound no "
         "most people my over know water than call first who may down side been "
         "now find any new work part take get place made live where after back "
         "little only round man year came show every good me give our under name "
         "very through just form sentence great think say help low line differ "
         "turn cause much mean before move right boy old too same tell does set "
         "three want air well also play small end put home read hand port large "
         "spell add even land here must big high such follow act why ask men "
         "change went light kind off need house picture try us again animal "
         "point mother world near build self earth father").split()

def text(n):
    out = []
    size = 0
    while size < n:
        w = rnd.choice(WORDS)
        out.append(w)
        size += len(w) + 1
    return (" ".join(out)).encode("utf-8")

def html(n):
    body = []
    size = 0
    while size < n:
        para = " ".join(rnd.choice(WORDS) for _ in range(rnd.randint(5, 30)))
        block = f'<p class="content" id="p{size}">{para}</p>\n'
        body.append(block)
        size += len(block)
    return ("<!DOCTYPE html><html><head><title>fixture</title></head><body>"
            + "".join(body) + "</body></html>").encode("utf-8")

cases = []
cases.append(("empty", b"", 11, 22))
cases.append(("one_byte", b"Q", 5, 22))
cases.append(("text_q0", text(40000), 0, 22))
cases.append(("text_q1", text(30000), 1, 18))
cases.append(("text_q5", text(50000), 5, 22))
cases.append(("text_q9", text(60000), 9, 22))
cases.append(("text_q11", text(80000), 11, 24))
cases.append(("html_q11", html(60000), 11, 22))
cases.append(("html_q4_w10", html(20000), 4, 10))
rnd2 = random.Random(77)
cases.append(("noise_q5", bytes(rnd2.randrange(256) for _ in range(30000)), 5, 22))
cases.append(("noise_q11", bytes(rnd2.randrange(256) for _ in range(20000)), 11, 16))
cases.append(("runs_q7", (b"A" * 5000 + b"BC" * 4000 + b"\x00" * 3000) * 3, 7, 22))
# short dictionary-word-rich strings (classic transform triggers)
cases.append(("dictwords_q11",
              b"The quick brown fox jumps over the lazy dog. Copyright information "
              b"available at http://www.example.com/index.html. JavaScript must be "
              b"enabled. All rights reserved worldwide, according to the documentation.",
              11, 22))
# utf-8 multibyte text (ferment transforms on non-ascii, utf8 context mode)
cases.append(("utf8_q11", ("élève naïve 你好世界 "
              "straße über " * 800).encode("utf-8"), 11, 22))
# binary-ish structured data (signed context mode likely)
cases.append(("deltas_q9", bytes(((i * 7) ^ (i >> 3)) & 0xff for i in range(25000)), 9, 22))
# large: multi-metablock at q11
cases.append(("big_text_q11", text(700000), 11, 22))

manifest = []
for name, data, q, w in cases:
    comp = brotlicffi.compress(data, quality=q, lgwin=w)
    with open(f"{OUT}/{name}.br", "wb") as f: f.write(comp)
    with open(f"{OUT}/{name}.raw", "wb") as f: f.write(data)
    manifest.append((name, len(data), len(comp), hashlib.md5(data).hexdigest()))
    print(f"{name}: {len(data)} -> {len(comp)} bytes (q={q}, w={w})")
print("total cases:", len(cases))
