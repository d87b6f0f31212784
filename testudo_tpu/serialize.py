"""arkworks-canonical-compatible serialization for BLS12-377 objects.

Byte layouts mirror ark-serialize 0.4 as relied on by the reference
transcript (/root/reference/src/poseidon_transcript.rs:22-28, 77-124):

  - Field elements: little-endian, fixed width (Fr: 32 bytes, Fq: 48 bytes).
  - Extension fields: components in tower order (c0 first), no flags; for
    extensions `Compress::Yes` == `Compress::No`.
  - G1/G2 uncompressed: x || y, with point flags in the top bits of the final
    byte of y (infinity = bit 6); infinity serializes x = y = 0.
  - G1/G2 compressed: x only, flags in the top bits of the final byte:
    bit 7 = y is "negative" (lexicographically larger than -y), bit 6 =
    infinity (with x = 0).
  - Vec<T>: u64 little-endian length prefix, then elements.
  - u64/usize: 8 bytes little-endian.

Note: with no Rust toolchain in this environment the flag-bit assignment
cannot be cross-checked against arkworks binaries; the layout above follows
ark-serialize 0.4's SWFlags and is used consistently on both the prover and
verifier sides of this implementation.
"""
from __future__ import annotations

from .fields.bls12_377 import P, R, FR_BYTES, FQ_BYTES
from .fields.host import Fq2, Fq6, Fq12

FLAG_INFINITY = 1 << 6
FLAG_Y_NEG = 1 << 7


def fr_to_bytes(x: int) -> bytes:
    return (x % R).to_bytes(FR_BYTES, "little")


def fq_to_bytes(x: int) -> bytes:
    return (x % P).to_bytes(FQ_BYTES, "little")


def fr_from_bytes(b: bytes):
    """Mirror of F::from_random_bytes (lib.rs:76): None when >= modulus."""
    v = int.from_bytes(b, "little")
    return v if v < R else None


def fq2_to_bytes(x: Fq2) -> bytes:
    return fq_to_bytes(x.c0) + fq_to_bytes(x.c1)


def fq6_to_bytes(x: Fq6) -> bytes:
    return fq2_to_bytes(x.c0) + fq2_to_bytes(x.c1) + fq2_to_bytes(x.c2)


def fq12_to_bytes(x: Fq12) -> bytes:
    return fq6_to_bytes(x.c0) + fq6_to_bytes(x.c1)


def _is_neg_fq(y: int) -> bool:
    # "negative" = y > -y in the canonical integer order
    return y > P - y


def _is_neg_fq2(y: Fq2) -> bool:
    # QuadExtField ordering: compare c1 first, then c0
    ny = -y
    if y.c1 != ny.c1:
        return y.c1 > ny.c1
    return y.c0 > ny.c0


def g1_to_bytes(pt, compress: bool) -> bytes:
    if compress:
        if pt is None:
            out = bytearray(fq_to_bytes(0))
            out[-1] |= FLAG_INFINITY
            return bytes(out)
        x, y = pt
        out = bytearray(fq_to_bytes(x))
        if _is_neg_fq(y % P):
            out[-1] |= FLAG_Y_NEG
        return bytes(out)
    if pt is None:
        out = bytearray(fq_to_bytes(0) * 2)
        out[-1] |= FLAG_INFINITY
        return bytes(out)
    x, y = pt
    return fq_to_bytes(x) + fq_to_bytes(y)


def g2_to_bytes(pt, compress: bool) -> bytes:
    if compress:
        if pt is None:
            out = bytearray(fq2_to_bytes(Fq2.zero()))
            out[-1] |= FLAG_INFINITY
            return bytes(out)
        x, y = pt
        out = bytearray(fq2_to_bytes(x))
        if _is_neg_fq2(y):
            out[-1] |= FLAG_Y_NEG
        return bytes(out)
    if pt is None:
        out = bytearray(fq2_to_bytes(Fq2.zero()) * 2)
        out[-1] |= FLAG_INFINITY
        return bytes(out)
    x, y = pt
    return fq2_to_bytes(x) + fq2_to_bytes(y)


def u64_to_bytes(x: int) -> bytes:
    return int(x).to_bytes(8, "little")


def vec_to_bytes(items, ser_fn) -> bytes:
    out = bytearray(u64_to_bytes(len(items)))
    for it in items:
        out += ser_fn(it)
    return bytes(out)
