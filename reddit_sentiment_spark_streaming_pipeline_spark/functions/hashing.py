"""Dialect-portable hashing expression generators for dedup operators.

MinHash and SimHash need hash functions that are *identical* in Spark and
in the DuckDB oracle. Both engines share md5(string) → lowercase hex, and
both accept the SQL fragment grammar used here (substr/instr/CASE/&), so
every expression below evaluates to the same values in both dialects.

- MinHash: ONE md5 per shingle, truncated to a 28-bit integer ``hv``; the
  K signature components are MINs of affine permutation proxies
  ``(a_k * hv + b_k) mod P`` (P = 2^31-1, a_k/b_k frozen 31-bit odds).
  Products stay < 2^59, inside signed-64 range in both engines — DuckDB
  *errors* on bigint overflow rather than wrapping, so the bound is a
  correctness requirement, not a nicety. One hash + cheap integer
  arithmetic replaces K md5 evaluations per shingle (the dominant CPU of
  the near-dup pipeline at corpus scale) and the min-agg compares 8-byte
  ints instead of 32-byte hex strings.
- SimHash: 64 bits from the first 16 hex nibbles of md5(word); per-bit
  tf-weighted ±1 sums; packed into four 16-bit integer chunks so Hamming
  distance is bit_count(xor) instead of 64 string comparisons.
"""

from __future__ import annotations

MINHASH_K = 12  # signature length
LSH_BANDS = 4  # bands (rows per band = K / BANDS = 3)
LSH_ROWS = MINHASH_K // LSH_BANDS

MINHASH_P = 2147483647  # 2^31 - 1 (Mersenne prime modulus)
# Frozen odd 31-bit multiplier/offset pairs (generated once from
# random.Random(20260813), hardcoded for cross-engine reproducibility).
MINHASH_AB = [
    (2128164061, 398802783), (596987483, 1147225395), (1916785055, 1479347477),
    (972347433, 116450323), (291219901, 430979123), (234034475, 1406942089),
    (1761180997, 1267685541), (924035317, 1172698797), (2038977239, 402639407),
    (2143289125, 1357670271), (1355823819, 2113210627), (668925749, 252657891),
]

SIMHASH_BITS = 64
SIMHASH_CHUNKS = 4  # 4 × 16-bit chunks
_CHUNK_BITS = SIMHASH_BITS // SIMHASH_CHUNKS

_HEX = "0123456789abcdef"


def hex28_expr(col: str, dialect: str) -> str:
    """First 7 hex chars of md5(col) as a 28-bit bigint.

    The one md5-per-shingle the MinHash pipeline pays. Spark parses hex
    via conv(); DuckDB via the '0x…' string cast (it has no conv).
    """
    if dialect == "spark":
        return f"cast(conv(substr(md5({col}), 1, 7), 16, 10) as bigint)"
    if dialect == "duckdb":
        return f"CAST('0x' || substr(md5({col}), 1, 7) AS BIGINT)"
    raise ValueError(f"unknown dialect {dialect!r}")


def minhash_exprs(hv_col: str = "hv") -> list[str]:
    """K aggregate SQL expressions over a precomputed ``hex28`` column:
    MIN((a_k * hv + b_k) mod P). Pure integer arithmetic — dialect-free."""
    return [
        f"min(({a} * {hv_col} + {b}) % {MINHASH_P})" for a, b in MINHASH_AB
    ]


def band_exprs(sig_prefix: str = "m") -> list[str]:
    """Band hash = md5 of the ':'-joined signature slice (separator needed:
    integer signature components render variable-width)."""
    out = []
    for b in range(LSH_BANDS):
        cols = ", ".join(
            f"{sig_prefix}{b * LSH_ROWS + j}" for j in range(LSH_ROWS)
        )
        out.append(f"md5(concat_ws(':', {cols}))")
    return out


def simhash_sum_exprs(tf_col: str = "tf", hash_col: str = "h") -> list[str]:
    """64 aggregate expressions: tf-weighted ±1 sum for each bit.

    Bit k = 4p + j lives in hex nibble p (0-based), mask 8>>j.
    """
    exprs = []
    for k in range(SIMHASH_BITS):
        p, j = divmod(k, 4)
        mask = 8 >> j
        nib = f"(instr('{_HEX}', substr({hash_col}, {p + 1}, 1)) - 1)"
        sign = f"CASE WHEN ({nib} & {mask}) > 0 THEN 1 ELSE -1 END"
        exprs.append(f"sum({tf_col} * {sign})")
    return exprs


def simhash_chunk_exprs(sum_prefix: str = "s") -> list[str]:
    """Pack sign bits of the 64 sums into 4 × 16-bit integers (MSB first)."""
    out = []
    for c in range(SIMHASH_CHUNKS):
        terms = []
        for i in range(_CHUNK_BITS):
            k = c * _CHUNK_BITS + i
            weight = 1 << (_CHUNK_BITS - 1 - i)
            terms.append(f"CASE WHEN {sum_prefix}{k} >= 0 THEN {weight} ELSE 0 END")
        out.append("(" + " + ".join(terms) + ")")
    return out


def hamming_expr(a_prefix: str, b_prefix: str, dialect: str) -> str:
    """Hamming distance between two packed simhashes via xor + bit_count.

    The one dialect split in this module: Spark spells bitwise xor `a ^ b`,
    while in DuckDB `^` is exponentiation and xor is the xor() function.
    """
    if dialect == "spark":
        terms = [f"bit_count({a_prefix}{c} ^ {b_prefix}{c})" for c in range(SIMHASH_CHUNKS)]
    elif dialect == "duckdb":
        terms = [f"bit_count(xor({a_prefix}{c}, {b_prefix}{c}))" for c in range(SIMHASH_CHUNKS)]
    else:
        raise ValueError(f"unknown dialect {dialect!r}")
    return " + ".join(terms)
