package graft.queries

/** Embedded REAL system-zstd frames for the `zstd_decode` gate (CLI
  * v1.5.7, levels -1/-3/-6/-19 — `tools/gen_zstd_fixtures.py` payload
  * definitions plus the mixed-content gate payload below), base64 so
  * the gate is self-contained. The oracle pins each frame's
  * decompressed length and md5, which come from the PAYLOAD DEFINITION
  * (deterministic generators), not from this decoder — a decode drift
  * flips the gate. */
object ZstdFixtures {

  /** name -> (base64 frame, decompressed length, payload md5). */
  val all: Seq[(String, String, Long, String)] = Seq(
    ("gate_mixed",
      "KLUv/WSTEI0NAOaUNhxwS9IGdqLa/dUf2oaOFXdX/0es7O6dEqo+/b8QPQAmAC4AzrKaEk91rwNQ5iBAJBZjJCQYBrM4GpBZcEAUA1PmwDgWycIMIGMkigMxBgIJBoU5CpJ5mFJKGcQCETgWAefySsS6NL/cJNNtab9qt7hc9sdWntmLfO+RueS2r1JskhFSz36rd2mEvUKjKtPzNvedMkaCJMZIEBBFYiHhGEXCSAIGwCxviO+9bq/VE+n+qXzEPoOZN/zP6oqI+qNddXkzi6HPabby6XYuaosJ84U+p9WKWvo041sagKuoMXw8SGXYfwOAg5KkLQYSYBCIMEGERymC9UYIjaCKP98NnQ7t+Ophloc2yHwFzU6X8UQje4bVkv8eZnloA5G4ZLdhbg010FKD3wRx4K3CsPfJxR1SnkKIwUoQ0FR/SOCvUgKk8KwdWSdONbI8aXhJ3GScxFFVGt76eOzwoi52Z3inUz2xXCA0vBzoTD+GnARkcrI7lVZYcg3TCC8M2rXBUpnjYYP3I78TnOTa6Ic+8E9qXSF9c0gkVyUMEoyDQn5lfpVEpkMmV86XzG6QzMSh+1WTB7Xt",
      4499L, "b5c25e3f9afc41f5a6390ef44cf8411d"),
    ("small_text",
      "KLUv/WSEAr0BAMQCdGhlIHF1aWNrIGJyb3duIGZveCBqdW1wcyBvdmVyIHRoZSBsYXp5IGRvZy4CAFChKsBoZxmu0cnB",
      900L, "d6cefcbcdc9f8101531523095a3eaa96"),
    ("repetitive",
      "KLUv/aQoHQEAVQEAwGFiY3h0aGUgY2F0IHNhdCBvbiBtYXQuIAQApd3O1WSylfOuL4Rf6m4I2U4Nrw==",
      73000L, "466a4169e263a68264fa87083393ad1a"),
    ("runs",
      "KLUv/aSghgEAVQAAEHp6AQCbhjnAAsMkoSc=",
      100000L, "c8a63b8dc8a30221a1fa4804e6dcd9bf"),
    ("tiny", "KLUv/SQBCQAAYVtujKk=", 1L, "0cc175b9c0f1b6a831c399e269772661"),
    ("empty", "KLUv/SQAAQAAmenYUQ==", 0L, "d41d8cd98f00b204e9800998ecf8427e"))
}
