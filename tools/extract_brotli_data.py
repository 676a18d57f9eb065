#!/usr/bin/env python
"""Extract the RFC 7932 standard data tables from the system Brotli library.

The Brotli format (RFC 7932) fixes three data artifacts every decoder
needs: the 122,784-byte static dictionary (Appendix A), the 2,048-byte
literal-context lookup table (section 7.1), and the 121 dictionary-word
transforms (Appendix B). They are standardized PUBLIC DATA — this script
reads them out of the canonical C library (libbrotlicommon.so, the
reference implementation of the spec) rather than hand-transcribing
thousands of constants from the RFC text:

  python tools/extract_brotli_data.py [libpath]

writes src/main/resources/graft/
  brotli_dict.bin        raw dictionary bytes (122,784)
  brotli_context.bin     context lookup table (2,048 = 4 modes x 512)
  brotli_transforms.bin  recovered transform list (see format below)

The transform list is recovered behaviorally: each of the 121 transforms
is applied (BrotliTransformDictionaryWord) to a probe word, and the
(prefix, operation, suffix) triple is reconstructed by diffing the
output. Operations: 0=identity, 1=ferment-first (uppercase first
character), 2=ferment-all, 10+n=omit first n (1..9), 20+n=omit last n.

brotli_transforms.bin format: u8 count, then per transform
  u8 prefix_len, prefix bytes, u8 op, u8 suffix_len, suffix bytes.

NOT part of the Scala library — dev tooling, run once per jar/update.
"""
import ctypes
import hashlib
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
RES = os.path.join(HERE, "..", "src", "main", "resources", "graft")

LIB = sys.argv[1] if len(sys.argv) > 1 else "/root/miniconda/lib/libbrotlicommon.so"


class BrotliDictionary(ctypes.Structure):
    _fields_ = [
        ("size_bits_by_length", ctypes.c_uint8 * 32),
        ("offsets_by_length", ctypes.c_uint32 * 32),
        ("data_size", ctypes.c_size_t),
        ("data", ctypes.POINTER(ctypes.c_uint8)),
    ]


def main():
    lib = ctypes.CDLL(LIB)
    os.makedirs(RES, exist_ok=True)

    # — static dictionary —
    lib.BrotliGetDictionary.restype = ctypes.POINTER(BrotliDictionary)
    d = lib.BrotliGetDictionary().contents
    assert d.data_size == 122784, f"unexpected dictionary size {d.data_size}"
    data = bytes(bytearray(d.data[i] for i in range(d.data_size)))
    # RFC 7932 word-count table: NWORDS[len] = 1 << size_bits (lengths 4..24)
    expect_bits = [0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8,
                   7, 7, 8, 7, 7, 6, 6, 5, 5]
    got_bits = list(d.size_bits_by_length[:25])
    assert got_bits == expect_bits, f"size_bits mismatch: {got_bits}"
    with open(os.path.join(RES, "brotli_dict.bin"), "wb") as f:
        f.write(data)
    print(f"brotli_dict.bin: {len(data)} bytes md5={hashlib.md5(data).hexdigest()}")

    # — context lookup table (4 modes x (256 p1 + 256 p2)) —
    lut = bytes(bytearray(
        (ctypes.c_uint8 * 2048).in_dll(lib, "_kBrotliContextLookupTable")))
    with open(os.path.join(RES, "brotli_context.bin"), "wb") as f:
        f.write(lut)
    print(f"brotli_context.bin: {len(lut)} bytes md5={hashlib.md5(lut).hexdigest()}")

    # — transforms, recovered behaviorally —
    # int BrotliTransformDictionaryWord(uint8_t* dst, const uint8_t* word,
    #                                   int len, const BrotliTransforms*, int idx)
    lib.BrotliGetTransforms.restype = ctypes.c_void_p
    transforms_ptr = lib.BrotliGetTransforms()
    lib.BrotliTransformDictionaryWord.restype = ctypes.c_int
    probe = b"abcdefghijklmnopqrst"  # 20 distinct lowercase chars

    def apply(idx, word=probe):
        dst = (ctypes.c_uint8 * 256)()
        n = lib.BrotliTransformDictionaryWord(
            dst, (ctypes.c_uint8 * len(word)).from_buffer_copy(word),
            ctypes.c_int(len(word)), ctypes.c_void_p(transforms_ptr),
            ctypes.c_int(idx))
        return bytes(bytearray(dst[:n]))

    out = bytearray([121])
    for idx in range(121):
        t = apply(idx)
        # locate the transformed probe inside the output
        op = None
        for omit_first in range(10):
            for omit_last in range(10):
                core = probe[omit_first:len(probe) - omit_last or None]
                variants = [
                    (core, 0 if omit_first == 0 and omit_last == 0 else
                     (10 + omit_first if omit_last == 0 else 20 + omit_last)),
                    (core[:1].upper() + core[1:], 1),
                    (core.upper(), 2),
                ]
                if omit_first and omit_last:
                    variants = []  # brotli never omits both ends
                for cand, code in variants:
                    pos = t.find(cand)
                    if pos >= 0 and (code in (0, 10 + omit_first, 20 + omit_last)
                                     or (omit_first == 0 and omit_last == 0)):
                        prefix, suffix = t[:pos], t[pos + len(cand):]
                        # longest-core match wins: stop at first (outer loops
                        # go shortest-omission first = longest core)
                        op = (prefix, code, suffix)
                        break
                if op:
                    break
            if op:
                break
        assert op is not None, f"could not recover transform {idx}: {t!r}"
        prefix, code, suffix = op
        # cross-check the recovery on a second probe word
        w2 = b"ZYXWVUTSRQPONMLKJIHG".lower()[::-1][:12]
        core2 = w2[code - 10 if 10 <= code < 20 else 0:
                   len(w2) - (code - 20) if code >= 20 else len(w2)]
        if code == 1:
            core2 = core2[:1].upper() + core2[1:]
        elif code == 2:
            core2 = core2.upper()
        assert apply(idx, w2) == prefix + core2 + suffix, f"recovery check failed idx={idx}"
        out += bytes([len(prefix)]) + prefix + bytes([code]) + \
            bytes([len(suffix)]) + suffix
    with open(os.path.join(RES, "brotli_transforms.bin"), "wb") as f:
        f.write(bytes(out))
    print(f"brotli_transforms.bin: {len(out)} bytes "
          f"md5={hashlib.md5(bytes(out)).hexdigest()}")


if __name__ == "__main__":
    main()
