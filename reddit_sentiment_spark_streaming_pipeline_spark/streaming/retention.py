"""Size-bounded retention for append-only result directories (K6 parity).

Reference: delete oldest .parquet files once a result dir exceeds a byte
cap (reddit_consumer.py:249-279). Same policy, expressed as a pure util the
sink owner calls after each append. At production scale this is a
table-format concern (Delta VACUUM / retention policies); the util is the
lightweight file-sink analog.
"""

from __future__ import annotations

import os


def enforce_retention(dir_path: str, max_bytes: int = 1_000_000) -> list[str]:
    """Delete oldest parquet data files until the directory fits the cap.

    Returns the deleted file paths (oldest-first), mirroring the
    reference's oldest-first deletion order.
    """
    if not os.path.isdir(dir_path):
        return []
    files = [
        os.path.join(dir_path, f)
        for f in os.listdir(dir_path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    files.sort(key=lambda p: (os.path.getmtime(p), p))
    total = sum(os.path.getsize(p) for p in files)
    deleted: list[str] = []
    for p in files:
        if total <= max_bytes:
            break
        total -= os.path.getsize(p)
        os.remove(p)
        deleted.append(p)
    return deleted
