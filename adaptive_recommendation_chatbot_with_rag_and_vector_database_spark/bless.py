"""Record oracle fingerprints for driver-verified queries.

Run ``python -m adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.bless``
at ROUND START, before editing any oracle SQL. At that moment the
committed oracle text is exactly the text the driver's latest
CORRECTNESS run executed, so recording ``sha256(current text)`` for
every hash-passed name in the LATEST round is sound. Names passed in
older rounds keep their existing manifest entries (recorded when they
passed); names whose oracle has since been edited simply never match
and stay front-loaded for re-verification (registry._verified_names).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

from . import registry


def bless(extra_exclude: set[str] | None = None) -> dict[str, str]:
    root = registry._repo_root()
    paths = sorted(
        glob.glob(os.path.join(root, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    if not paths:
        return {}
    with open(paths[-1]) as fh:
        latest = json.load(fh)
    oracles = registry.oracle_sql()
    manifest = registry._blessed_fingerprints()
    exclude = extra_exclude or set()
    for name, row in latest.items():
        if name in exclude or name not in oracles:
            continue
        if isinstance(row, dict) and row.get("hash_match"):
            manifest[name] = registry.oracle_fingerprint(oracles[name])
    out = os.path.join(root, "ORACLE_VERIFIED.json")
    with open(out, "w") as fh:
        json.dump(dict(sorted(manifest.items())), fh, indent=1)
        fh.write("\n")
    return manifest


if __name__ == "__main__":
    m = bless(set(sys.argv[1:]))
    print(f"blessed {len(m)} oracle fingerprints")
