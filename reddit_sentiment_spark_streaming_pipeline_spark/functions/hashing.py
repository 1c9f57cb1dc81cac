"""Dialect-portable hashing expression generators for dedup operators.

MinHash and SimHash need hash functions that are *identical* in Spark and
in the DuckDB oracle. Both engines share md5(string) → lowercase hex, and
both accept the SQL fragment grammar used here (substr/instr/CASE/&), so
every expression below is generated once and evaluated in both dialects.

- MinHash: hash_i(shingle) = md5('<i>:' || shingle); the signature component
  is the lexicographic MIN of the hex strings — a valid uniform permutation
  proxy, engine-independent.
- SimHash: 64 bits from the first 16 hex nibbles of md5(word); per-bit
  tf-weighted ±1 sums; packed into four 16-bit integer chunks so Hamming
  distance is bit_count(xor) instead of 64 string comparisons.
"""

from __future__ import annotations

MINHASH_K = 12  # signature length
LSH_BANDS = 4  # bands (rows per band = K / BANDS = 3)
LSH_ROWS = MINHASH_K // LSH_BANDS

SIMHASH_BITS = 64
SIMHASH_CHUNKS = 4  # 4 × 16-bit chunks
_CHUNK_BITS = SIMHASH_BITS // SIMHASH_CHUNKS

_HEX = "0123456789abcdef"


def minhash_exprs(shingle_col: str = "shingle") -> list[str]:
    """K aggregate SQL expressions: MIN(md5('<i>:' || shingle))."""
    return [
        f"min(md5(concat('{i}:', {shingle_col})))" for i in range(MINHASH_K)
    ]


def band_exprs(sig_prefix: str = "m") -> list[str]:
    """Band hash = md5 of the concatenated signature slice."""
    out = []
    for b in range(LSH_BANDS):
        cols = ", ".join(f"{sig_prefix}{b * LSH_ROWS + j}" for j in range(LSH_ROWS))
        out.append(f"md5(concat({cols}))")
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
