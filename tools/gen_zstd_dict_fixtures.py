#!/usr/bin/env python3
# Dev-time fixture generator for dictionary-zstd: trains a REAL
# dictionary with the system zstd (--train) over a synthetic corpus of
# similar small documents (the shape dictionaries exist for), then
# compresses held-out samples with -D at several levels. The Scala
# decoder must reproduce each input byte-for-byte given the dictionary.
# Not used at runtime.

import os, random, subprocess, hashlib, glob

OUT = "/root/repo/src/test/resources/zstd_dict"
TMP = "/tmp/zstd_dict_train"
os.makedirs(OUT, exist_ok=True)
os.makedirs(TMP, exist_ok=True)

rnd = random.Random(99)
WORDS = ("request response header status handler route session token user "
         "account balance order item price quantity shipping address city "
         "country payment method invoice total discount currency timestamp").split()

def doc(i):
    fields = [f'"{w}": "{w}-{rnd.randrange(1000)}"' for w in rnd.sample(WORDS, 12)]
    return ('{"id": %d, "type": "record", %s}' % (i, ", ".join(fields))).encode()

# training corpus
for i in range(300):
    with open(f"{TMP}/train_{i:03d}.json", "wb") as f:
        f.write(doc(i))

subprocess.run(["zstd", "--train", *glob.glob(f"{TMP}/train_*.json"),
                "-o", f"{OUT}/fixture.dict", "-f", "--maxdict=16384"],
               check=True, capture_output=True)
dict_bytes = open(f"{OUT}/fixture.dict", "rb").read()
print("dictionary:", len(dict_bytes), "bytes, id:",
      hex(int.from_bytes(dict_bytes[4:8], "little")))

# held-out samples at several levels (incl. 19 for FSE-heavy streams)
for li, level in enumerate((1, 3, 9, 19)):
    data = b"\n".join(doc(10_000 + li * 100 + k) for k in range(20 + li * 30))
    raw = f"{OUT}/sample_l{level}.raw"
    with open(raw, "wb") as f: f.write(data)
    subprocess.run(["zstd", f"-{level}", "-D", f"{OUT}/fixture.dict",
                    raw, "-o", f"{OUT}/sample_l{level}.zst", "-f"],
                   check=True, capture_output=True)
    comp = open(f"{OUT}/sample_l{level}.zst", "rb").read()
    print(f"l{level}: {len(data)} -> {len(comp)} bytes md5={hashlib.md5(data).hexdigest()}")

# one tiny sample where dictionary references dominate
tiny = doc(777)
with open(f"{OUT}/tiny.raw", "wb") as f: f.write(tiny)
subprocess.run(["zstd", "-19", "-D", f"{OUT}/fixture.dict",
                f"{OUT}/tiny.raw", "-o", f"{OUT}/tiny.zst", "-f"],
               check=True, capture_output=True)
print("tiny:", len(tiny), "->", os.path.getsize(f"{OUT}/tiny.zst"))
